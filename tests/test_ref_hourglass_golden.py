"""Golden test: Flax Hourglass backbone vs the ACTUAL reference PoseNet.

Instantiates the reference torch model (reference: src/Models/Hourglass/
Hourglass.py:39-91) with random weights, converts them with
convert_hourglass_state_dict, and asserts forward parity on a fixed input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pemp_tpu.models.hourglass import PoseNet
from pemp_tpu.train.convert import convert_hourglass_state_dict
from ref_shim import load_ref_hourglass

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def test_hourglass_forward_parity():
    hg = load_ref_hourglass()
    torch.manual_seed(0)
    # small dims keep the test fast; the topology (recursion depth 4,
    # nstack 2, merges) is the full reference one
    nstack, inp_dim, oup_dim = 2, 32, 20
    ref = hg.PoseNet(nstack, inp_dim, oup_dim, bn=False, increase=16)
    ref.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_preds, ref_feat = ref(torch.from_numpy(img))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, _ = convert_hourglass_state_dict(sd, nstack=nstack)

    model = PoseNet(nstack=nstack, inp_dim=inp_dim, oup_dim=oup_dim, bn=False, increase=16)
    img_nhwc = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    got_preds, got_feat = model.apply({"params": params}, img_nhwc, train=False)

    assert len(got_preds) == len(ref_preds)
    for i, (g, r) in enumerate(zip(got_preds, ref_preds)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), r.numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"stack {i}",
        )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_feat), (0, 3, 1, 2)), ref_feat.numpy(),
        atol=1e-4, rtol=1e-4,
    )


def test_hourglass_converter_covers_init_tree():
    hg = load_ref_hourglass()
    torch.manual_seed(1)
    ref = hg.PoseNet(2, 32, 20, bn=False, increase=16)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, _ = convert_hourglass_state_dict(sd, nstack=2)

    model = PoseNet(nstack=2, inp_dim=32, oup_dim=20, bn=False, increase=16)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    import flax

    def keyset(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= keyset(v, prefix + k + "/")
            else:
                out.add(prefix + k + ":" + "x".join(map(str, np.shape(v))))
        return out

    assert keyset(params) == keyset(flax.core.unfreeze(init["params"]))
