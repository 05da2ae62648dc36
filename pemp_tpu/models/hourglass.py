"""4-stack Hourglass backbone in Flax (NHWC, TPU-native).

Re-design of the reference's PoseNet
(reference: src/Models/Hourglass/Hourglass.py:39-91, Layers.py:1-88):
stride-4 stem -> per-stack recursive Hourglass(4, 256) + two 3x3 convs ->
1x1 out head (oup_dim=68: 17 heatmaps + 17 tags + 34 unused legacy channels)
with inter-stack merges. The recursion unrolls at trace time.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvBnRelu(nn.Module):
    """reference Layers.py Conv: conv(+bias) -> relu? -> bn?"""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[((self.kernel - 1) // 2,) * 2] * 2,
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.relu:
            x = nn.relu(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return x


def _maxpool2(x):
    import jax

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upsample_nearest2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class HourglassBlock(nn.Module):
    """Recursive hourglass. reference: Layers.py:66-88"""

    n: int
    f: int
    bn: bool = False
    increase: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        nf = self.f + self.increase
        up1 = ConvBnRelu(self.f, 3, bn=self.bn, dtype=self.dtype, name="up1")(x, train)
        low = _maxpool2(x)
        low = ConvBnRelu(nf, 3, bn=self.bn, dtype=self.dtype, name="low1")(low, train)
        if self.n > 1:
            # nested blocks use the DEFAULT increase (128) regardless of the
            # outer value — reference quirk: Layers.py:75 passes no increase
            low = HourglassBlock(
                self.n - 1, nf, self.bn, 128, self.dtype, name="low2"
            )(low, train)
        else:
            low = ConvBnRelu(nf, 3, bn=self.bn, dtype=self.dtype, name="low2")(low, train)
        low = ConvBnRelu(self.f, 3, dtype=self.dtype, name="low3")(low, train)
        return up1 + _upsample_nearest2(low)


class PoseNet(nn.Module):
    """reference: Hourglass.py:39-76"""

    nstack: int = 4
    inp_dim: int = 256
    oup_dim: int = 68
    bn: bool = False
    increase: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = ConvBnRelu(64, 7, 2, bn=self.bn, dtype=dt, name="pre_0")(x, train)
        x = ConvBnRelu(128, 3, bn=self.bn, dtype=dt, name="pre_1")(x, train)
        x = _maxpool2(x)
        x = ConvBnRelu(128, 3, bn=self.bn, dtype=dt, name="pre_2")(x, train)
        x = ConvBnRelu(self.inp_dim, 3, bn=self.bn, dtype=dt, name="pre_3")(x, train)

        preds = []
        feature = None
        for i in range(self.nstack):
            feature = HourglassBlock(
                4, self.inp_dim, self.bn, self.increase, dt, name=f"hg_{i}"
            )(x, train)
            feature = ConvBnRelu(self.inp_dim, 3, dtype=dt, name=f"feat_{i}_0")(feature, train)
            feature = ConvBnRelu(self.inp_dim, 3, dtype=dt, name=f"feat_{i}_1")(feature, train)
            pred = ConvBnRelu(
                self.oup_dim, 1, relu=False, dtype=dt, name=f"outs_{i}"
            )(feature, train)
            preds.append(pred)
            if i != self.nstack - 1:
                mp = ConvBnRelu(self.inp_dim, 1, relu=False, dtype=dt, name=f"merge_preds_{i}")(pred, train)
                mf = ConvBnRelu(self.inp_dim, 1, relu=False, dtype=dt, name=f"merge_features_{i}")(feature, train)
                x = x + mp + mf
        return preds, feature


def hg_process_output(preds, feature, num_joints: int = 17, mode: str = "avg"):
    """Slice heatmaps/tags from the last stack.

    reference: Hourglass.py:86-91. Returns (scoremaps, features, tags) NHWC.
    """
    last = preds[-1]
    scoremaps = last[..., :num_joints]
    tags = last[..., num_joints : 2 * num_joints]
    return scoremaps, feature, tags
