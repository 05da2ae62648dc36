"""Space-to-depth deconv branch == standard deconv branch (eval).

The s2d eval path (models/hrnet.py _deconv_branch_s2d) recomputes the
HigherHRNet deconv stage — ConvTranspose k4 s2 p1 + BasicBlocks — as 2x2
convs on the half-resolution grid with 4x channels (the shape that maps
~31% faster onto the TPU MXU). It must be numerically equivalent to the
standard module path on the same parameters, including at the image borders
(per-conv zero padding is emulated by masking) and for the BatchNorm
running-stat affine (randomized stats below would expose any halo leak).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet


def _tiny_spec(**kw):
    base = dict(
        num_joints=3,
        tag_per_joint=True,
        stem_inplanes=8,
        final_conv_kernel=1,
        stages=(
            (1, 2, (1, 1), (8, 16)),
            (1, 2, (1, 1), (8, 16)),
            (1, 2, (1, 1), (8, 16)),
        ),
        num_deconvs=1,
        deconv_channels=(8,),
        deconv_kernel=(4,),
        deconv_num_basic_blocks=2,
        deconv_cat_output=(True,),
        with_ae_loss=(True, False),
        feature_fusion="avg",
    )
    base.update(kw)
    return HRNetSpec(**base)


def _randomize(variables, rng):
    """Keep the (well-scaled) init kernels; randomize every 1-D leaf — BN
    scale/bias/mean/var and conv biases. Nonzero BN bias/mean are what catch
    zero-halo leaks in the s2d masking (kept positive-ish so vars are valid
    and activations stay O(1) for tight comparison)."""
    def f(leaf):
        if leaf.ndim == 1:
            r = rng.normal(size=leaf.shape).astype(np.float32) * 0.5
            return jnp.asarray(np.abs(r) + 0.25)
        return leaf

    return jax.tree.map(f, variables)


@pytest.mark.parametrize(
    "hw,blocks,cat",
    [((64, 64), 2, True), ((64, 96), 3, False)],
)
def test_s2d_deconv_matches_standard(hw, blocks, cat):
    spec = _tiny_spec(deconv_num_basic_blocks=blocks, deconv_cat_output=(cat,))
    m_std = PoseHigherResolutionNet(spec)
    m_s2d = PoseHigherResolutionNet(dataclasses.replace(spec, s2d_eval=True))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, hw[0], hw[1], 3)).astype(np.float32))
    variables = m_std.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize(variables, rng)

    outs_std, feat_std = m_std.apply(variables, x, train=False)
    outs_s2d, feat_s2d = m_s2d.apply(variables, x, train=False)

    assert len(outs_std) == len(outs_s2d)
    for a, b in zip(outs_std, outs_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(feat_std), np.asarray(feat_s2d), rtol=2e-4, atol=2e-4
    )


def test_s2d_param_tree_identical():
    """Init through the s2d branch produces the standard param tree."""
    spec = _tiny_spec()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_std = PoseHigherResolutionNet(spec).init(jax.random.PRNGKey(1), x, train=False)
    v_s2d = PoseHigherResolutionNet(
        dataclasses.replace(spec, s2d_eval=True)
    ).init(jax.random.PRNGKey(1), x, train=False)
    paths_std = {jax.tree_util.keystr(p): l.shape for p, l in
                 jax.tree_util.tree_flatten_with_path(v_std)[0]}
    paths_s2d = {jax.tree_util.keystr(p): l.shape for p, l in
                 jax.tree_util.tree_flatten_with_path(v_s2d)[0]}
    assert paths_std == paths_s2d


def test_s2d_train_mode_uses_standard_path():
    """train=True must take the standard branch (batch-stat updates)."""
    spec = _tiny_spec()
    m = PoseHigherResolutionNet(dataclasses.replace(spec, s2d_eval=True))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(2), x, train=True)
    outs, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])[0:1][0]
    assert outs[0].shape[1] == 16  # 1/4 res head
