"""Golden numerical parity: reference torch HRNet vs our flax HRNet.

Instantiates the reference PoseHigherResolutionNet (torch CPU) with random
weights, converts the state_dict with pemp_tpu.train.convert, and compares
forward outputs on the same input. Guards the whole weight-porting path and
every architectural detail (BN eps/momentum, fuse order, deconv convention).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/src"
torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE), reason="reference checkout not available"
    ),
    pytest.mark.slow,  # heavy compiles; excluded by -m 'not slow'
]


@pytest.fixture(scope="module")
def torch_hrnet():
    sys.path.insert(0, os.path.join(REFERENCE, "Models", "HigherHRNet"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_hrnet", os.path.join(REFERENCE, "Models", "HigherHRNet", "hrnet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pemp_tpu.config import get_config

    cfg = get_config()
    torch.manual_seed(0)
    model = mod.PoseHigherResolutionNet(cfg)
    model.eval()
    # randomize BN stats so eval-mode normalization is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return cfg, model


def test_backbone_parity_vs_reference(torch_hrnet):
    cfg, tmodel = torch_hrnet
    import jax
    import jax.numpy as jnp

    from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet
    from pemp_tpu.train.convert import convert_hrnet_state_dict

    spec = HRNetSpec.from_config(cfg)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_hrnet_state_dict(sd, spec)

    jmodel = PoseHigherResolutionNet(spec)
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    init_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    # converted trees must exactly cover the initialized trees
    def keyset(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= keyset(v, prefix + k + "/")
            else:
                out.add(prefix + k)
        return out

    import flax

    init_p = flax.core.unfreeze(init_vars["params"])
    init_s = flax.core.unfreeze(init_vars["batch_stats"])
    assert keyset(params) == keyset(init_p)
    assert keyset(stats) == keyset(init_s)
    # shapes match
    flat_c = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    (outs_j, feats_j) = jmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    with torch.no_grad():
        outs_t, feats_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for jout, tout in zip(outs_j, outs_t):
        got = np.asarray(jout).transpose(0, 3, 1, 2)
        want = tout.numpy()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    got_f = np.asarray(feats_j).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_f, feats_t.numpy(), rtol=2e-4, atol=2e-4)
