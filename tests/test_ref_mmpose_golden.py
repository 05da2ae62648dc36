"""Golden numerical parity: the *actual* reference mmpose BottomUp-HigherHRNet
(torch, run under a tiny mmcv shim) vs our flax HRNet via
convert_mmpose_state_dict.

This validates the CrowdPose checkpoint path (reference: src/Models/
HigherHRNet/mmpose/backbone.py:9-503 + keypoint_head.py + higher_hr_net.py,
loaded in PoseEstimation.py:31-32) at weight level: the converter's prefix
stripping + the claim that the mmpose graph is numerically identical to the
HigherHRNet graph.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/src"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

sys.path.insert(0, os.path.dirname(__file__))
from ref_shim import load_ref_mmpose  # noqa: E402


@pytest.fixture(scope="module")
def torch_mmpose():
    hh = load_ref_mmpose()

    from pemp_tpu.config import get_config

    cfg = get_config()
    torch.manual_seed(0)
    model = hh.get_mmpose_hrnet(cfg)
    model.eval()
    # randomize BN stats so eval-mode normalization is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return cfg, model


def test_mmpose_parity_vs_reference(torch_mmpose):
    cfg, tmodel = torch_mmpose
    import jax
    import jax.numpy as jnp

    from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet
    from pemp_tpu.train.convert import convert_mmpose_state_dict

    spec = HRNetSpec.from_config(cfg)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_mmpose_state_dict(sd, spec)

    jmodel = PoseHigherResolutionNet(spec)
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    init_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def keyset(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= keyset(v, prefix + k + "/")
            else:
                out.add(prefix + k)
        return out

    import flax

    assert keyset(params) == keyset(flax.core.unfreeze(init_vars["params"]))
    assert keyset(stats) == keyset(flax.core.unfreeze(init_vars["batch_stats"]))

    outs_j, feats_j = jmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        outs_t, feats_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for jout, tout in zip(outs_j, outs_t):
        got = np.asarray(jout).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, tout.numpy(), rtol=2e-4, atol=2e-4)
    got_f = np.asarray(feats_j).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_f, feats_t.numpy(), rtol=2e-4, atol=2e-4)
