"""HigherHRNet backbone in Flax (NHWC, TPU-native).

Re-design of the reference's PoseHigherResolutionNet
(reference: src/Models/HigherHRNet/hrnet.py:248-544): stem (2x stride-2 conv +
4 Bottlenecks) -> stages 2/3/4 of parallel-branch HighResolutionModules with
exchange/fuse units -> final 1x1 head (J heatmaps + J tags @ 1/4 res) ->
deconv (concat head output, ConvTranspose x2, 4 BasicBlocks) -> second head
(J heatmaps @ 1/2 res). Also emits the MPN feature map with fusion modes
pool/avg/small/large/cat_multi (hrnet.py:528-542).

TPU notes: NHWC layout so convs tile onto the MXU without transposes; all
branch/fuse python loops unroll at trace time into one fused XLA graph;
compute dtype is configurable (bfloat16 by default via the composite model)
with fp32 params and BN statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - 0.1


# ---------------------------------------------------------------------------
# Space-to-depth deconv branch (TPU eval path)
#
# The deconv branch's 3x3 stride-1 convs at full output resolution (e.g.
# 48ch @ 320px for w48/640) run at ~40% of their MXU mapping: N=48 output
# channels fill 48/128 of the output lanes. The same computation expressed on
# the space-to-depth grid — 2x2 convs over 4x the channels at half the
# resolution — measures 31% faster per conv on TPU despite carrying 16/9 the
# FLOPs (the 2x2 x 4C x 4C kernel embeds the 3x3 x C x C taps with 36/64
# structural density).
#
# Exactness: a 3x3 SAME conv maps to a 2x2 conv on the s2d grid whose output
# is shifted by +1 original pixel per spatial dim (output s2d row t, phase p
# holds original row 2t + p - S with the shift S growing by 1 per conv); the
# k4 s2 p1 ConvTranspose maps to a 2x2 conv from the coarse grid with the
# same +1 shift. Residual adds re-align by a one-s2d-pixel pad/slice (a
# BasicBlock's two convs shift by exactly one s2d pixel). Each conv's zero
# padding is emulated by masking entries whose original coordinate falls
# outside the image before every conv (eval BatchNorm's bias leaks nonzeros
# into the out-of-image halo otherwise). The cumulative shift is undone by
# the final depth-to-space slice. BN at eval folds to a per-channel affine,
# replicated across the four phases.
# ---------------------------------------------------------------------------


class _ConvKernelParams(nn.Module):
    """Raw conv kernel under the same scope layout as nn.Conv/nn.ConvTranspose
    (use_bias=False), so the s2d eval path shares checkpoints with the
    standard path."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNStatParams(nn.Module):
    """BatchNorm params + running stats under nn.BatchNorm's scope layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class _BasicBlockParams(nn.Module):
    """Param holders matching BasicBlock's children (stride 1, no downsample)."""

    planes: int

    @nn.compact
    def __call__(self):
        c = self.planes
        return {
            "conv1": _ConvKernelParams((3, 3, c, c), name="conv1")(),
            "bn1": _BNStatParams(c, name="bn1")(),
            "conv2": _ConvKernelParams((3, 3, c, c), name="conv2")(),
            "bn2": _BNStatParams(c, name="bn2")(),
        }


def _s2d_conv3_kernel(w3):
    """(3,3,ci,co) SAME conv -> (2,2,4ci,4co) s2d conv, +1px output shift.

    Channel packing is phase-major: index (py*2+px)*C + c. Output s2d row t,
    phase p reads input window rows [t-1, t]; tap (w, q) of output phase p
    carries original offset dy = 2w + q - 1 - p (zero outside [-1, 1])."""
    ci, co = w3.shape[2], w3.shape[3]
    zero = jnp.zeros((ci, co), w3.dtype)
    rows = []
    for wy in range(2):
        cols = []
        for wx in range(2):
            inblocks = []
            for qy in range(2):
                for qx in range(2):
                    outblocks = []
                    for py in range(2):
                        for px in range(2):
                            dy = 2 * wy + qy - 1 - py
                            dx = 2 * wx + qx - 1 - px
                            ok = -1 <= dy <= 1 and -1 <= dx <= 1
                            outblocks.append(w3[dy + 1, dx + 1] if ok else zero)
                    inblocks.append(jnp.concatenate(outblocks, axis=1))
            cols.append(jnp.concatenate(inblocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (2, 2, 4ci, 4co)


def _s2d_deconv4_kernel(wt):
    """torch ConvTranspose2d k4 s2 p1 kernel (stored (4,4,out,in)) -> the
    equivalent (2,2,ci,4co) conv from the coarse grid, +1px output shift.

    Output s2d row t phase p holds original row 2t - 1 + p and reads coarse
    window rows [t-1, t]; tap w of phase p uses kernel index p - 2w + 2."""
    outs = []
    for wy in range(2):
        row = []
        for wx in range(2):
            blocks = []
            for py in range(2):
                for px in range(2):
                    blocks.append(
                        jnp.transpose(wt[py - 2 * wy + 2, px - 2 * wx + 2], (1, 0))
                    )
            row.append(jnp.concatenate(blocks, axis=1))  # (ci, 4co)
        outs.append(jnp.stack(row))
    return jnp.stack(outs)  # (2, 2, ci, 4co)


def _s2d_conv(x, kernel, pad_y, pad_x):
    """2x2 VALID conv, NHWC, with explicit (top,bot)/(left,right) padding."""
    import jax

    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=(pad_y, pad_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _s2d_phase_mask(rows, shift, hw):
    """(rows, 2) {0,1}: original coord 2t + p - shift inside [0, hw)."""
    t = jnp.arange(rows)[:, None]
    p = jnp.arange(2)[None, :]
    f = 2 * t + p - shift
    return ((f >= 0) & (f < hw)).astype(jnp.float32)


def _s2d_mask_apply(x, shift, hh, ww, channels):
    """Zero entries whose original coordinate is outside the image (emulates
    the per-conv zero padding of the full-resolution formulation)."""
    b, rh, rw, _ = x.shape
    my = _s2d_phase_mask(rh, shift, hh).astype(x.dtype)
    mx = _s2d_phase_mask(rw, shift, ww).astype(x.dtype)
    xv = x.reshape(b, rh, rw, 2, 2, channels)
    xv = xv * my[None, :, None, :, None, None] * mx[None, None, :, None, :, None]
    return xv.reshape(b, rh, rw, 4 * channels)


def _s2d_bn_relu(x, bn_params, dtype, relu=True):
    """Eval BatchNorm folded to an affine, phase-replicated 4x, then ReLU."""
    scale, bias, mean, var = bn_params
    g = scale / jnp.sqrt(var + 1e-5)
    b = bias - mean * g
    g4 = jnp.tile(g, 4).astype(dtype)
    b4 = jnp.tile(b, 4).astype(dtype)
    y = x * g4 + b4
    return nn.relu(y) if relu else y


def _d2s_extract(x, shift, hh, ww, channels):
    """Depth-to-space and slice off the accumulated shift: returns the
    (B, hh, ww, C) full-resolution tensor."""
    b, rh, rw, _ = x.shape
    xv = x.reshape(b, rh, rw, 2, 2, channels)
    xv = jnp.transpose(xv, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * rh, 2 * rw, channels)
    return xv[:, shift:shift + hh, shift:shift + ww]


def _bn(dtype, name=None):
    return nn.BatchNorm(
        use_running_average=None,
        momentum=1.0 - BN_MOMENTUM,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def _conv(features, kernel, stride=1, use_bias=False, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2 if kernel > 1 else "VALID",
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """reference: hrnet.py:32-61"""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = _bn(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, dtype=self.dtype, name="conv2")(out)
        out = _bn(self.dtype, "bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = _conv(self.planes, 1, self.stride, dtype=self.dtype, name="downsample_conv")(x)
            residual = _bn(self.dtype, "downsample_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """reference: hrnet.py:64-102 (expansion 4)"""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = _bn(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv2")(out)
        out = _bn(self.dtype, "bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, dtype=self.dtype, name="conv3")(out)
        out = _bn(self.dtype, "bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = _conv(
                self.planes * self.expansion, 1, self.stride, dtype=self.dtype, name="downsample_conv"
            )(x)
            residual = _bn(self.dtype, "downsample_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


def _upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


def _resize_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent."""
    import jax

    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


class HighResolutionModule(nn.Module):
    """Parallel branches + exchange/fuse unit. reference: hrnet.py:105-239"""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        nb = self.num_branches
        if nb == 1:
            out = xs[0]
            for k in range(self.num_blocks[0]):
                out = BasicBlock(
                    self.num_channels[0],
                    downsample=(k == 0 and out.shape[-1] != self.num_channels[0]),
                    dtype=self.dtype,
                    name=f"branches_0_{k}",
                )(out, train)
            return [out]

        ys = []
        for i in range(nb):
            out = xs[i]
            for k in range(self.num_blocks[i]):
                out = BasicBlock(
                    self.num_channels[i],
                    downsample=(k == 0 and out.shape[-1] != self.num_channels[i]),
                    dtype=self.dtype,
                    name=f"branches_{i}_{k}",
                )(out, train)
            ys.append(out)

        num_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            y = None
            for j in range(nb):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # 1x1 conv + BN + nearest upsample 2^(j-i) (hrnet.py:184-192)
                    t = _conv(self.num_channels[i], 1, dtype=self.dtype, name=f"fuse_{i}_{j}_conv")(ys[j])
                    t = _bn(self.dtype, f"fuse_{i}_{j}_bn")(t, use_running_average=not train)
                    t = _upsample_nearest(t, 2 ** (j - i))
                else:
                    # (i-j) strided 3x3 convs downsampling (hrnet.py:196-213)
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        t = _conv(ch, 3, 2, dtype=self.dtype, name=f"fuse_{i}_{j}_{k}_conv")(t)
                        t = _bn(self.dtype, f"fuse_{i}_{j}_{k}_bn")(t, use_running_average=not train)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


@dataclasses.dataclass(frozen=True)
class HRNetSpec:
    """Static architecture spec extracted from the config tree."""

    num_joints: int = 17
    tag_per_joint: bool = True
    stem_inplanes: int = 64
    final_conv_kernel: int = 1
    stages: tuple = (
        # (num_modules, num_branches, num_blocks, num_channels)
        (1, 2, (4, 4), (32, 64)),
        (4, 3, (4, 4, 4), (32, 64, 128)),
        (3, 4, (4, 4, 4, 4), (32, 64, 128, 256)),
    )
    num_deconvs: int = 1
    deconv_channels: tuple = (32,)
    deconv_kernel: tuple = (4,)
    deconv_num_basic_blocks: int = 4
    deconv_cat_output: tuple = (True,)
    with_ae_loss: tuple = (True, False)
    feature_fusion: str = "avg"
    # eval-only space-to-depth deconv branch (TPU perf; exact — see the
    # s2d helper block above). Enabled by build_pose_model on TPU.
    s2d_eval: bool = False

    @classmethod
    def from_config(cls, config) -> "HRNetSpec":
        e = config.MODEL.HRNET.EXTRA
        stages = tuple(
            (
                s.NUM_MODULES,
                s.NUM_BRANCHES,
                tuple(s.NUM_BLOCKS),
                tuple(s.NUM_CHANNELS),
            )
            for s in (e.STAGE2, e.STAGE3, e.STAGE4)
        )
        return cls(
            num_joints=config.MODEL.HRNET.NUM_JOINTS,
            tag_per_joint=config.MODEL.HRNET.TAG_PER_JOINT,
            stem_inplanes=e.STEM_INPLANES,
            final_conv_kernel=e.FINAL_CONV_KERNEL,
            stages=stages,
            num_deconvs=e.DECONV.NUM_DECONVS,
            deconv_channels=tuple(e.DECONV.NUM_CHANNELS),
            deconv_kernel=tuple(e.DECONV.KERNEL_SIZE),
            deconv_num_basic_blocks=e.DECONV.NUM_BASIC_BLOCKS,
            deconv_cat_output=tuple(e.DECONV.CAT_OUTPUT),
            with_ae_loss=tuple(config.MODEL.HRNET.LOSS.WITH_AE_LOSS),
            feature_fusion=config.MODEL.HRNET.FEATURE_FUSION,
        )


class PoseHigherResolutionNet(nn.Module):
    """reference: hrnet.py:248-544"""

    spec: HRNetSpec
    dtype: Any = jnp.float32

    def _deconv_branch_s2d(self, x, i):
        """Space-to-depth eval form of deconv stage ``i``: ConvTranspose +
        BasicBlocks as 2x2 convs on the half-resolution grid (4x channels),
        exact vs the standard branch (see the s2d helper block). Reads the
        same params as the standard modules via param holders."""
        spec, dt = self.spec, self.dtype
        c = spec.deconv_channels[i]
        b, hc, wc, ci = x.shape
        hh, ww = 2 * hc, 2 * wc
        nblk = spec.deconv_num_basic_blocks
        s_final = 1 + 2 * nblk
        # rows needed to cover original coords [0, hh) at the final shift,
        # rounded up to the f32 sublane tile
        rh = -(-(hc + 1 + (s_final - 1) // 2) // 8) * 8
        rw = -(-(wc + 1 + (s_final - 1) // 2) // 8) * 8

        wt = _ConvKernelParams((4, 4, c, ci), name=f"deconv_{i}_conv")()
        k2 = _s2d_deconv4_kernel(jnp.asarray(wt, dt))
        h = _s2d_conv(x.astype(dt), k2, (1, rh - hc), (1, rw - wc))
        bn = _BNStatParams(c, name=f"deconv_{i}_bn")()
        h = _s2d_bn_relu(h, bn, dt)
        shift = 1
        for kblk in range(nblk):
            p = _BasicBlockParams(c, name=f"deconv_{i}_block{kblk}")()
            hm = _s2d_mask_apply(h, shift, hh, ww, c)
            t = _s2d_conv(
                hm, _s2d_conv3_kernel(jnp.asarray(p["conv1"], dt)), (1, 0), (1, 0)
            )
            t = _s2d_bn_relu(t, p["bn1"], dt)
            t = _s2d_mask_apply(t, shift + 1, hh, ww, c)
            t = _s2d_conv(
                t, _s2d_conv3_kernel(jnp.asarray(p["conv2"], dt)), (1, 0), (1, 0)
            )
            t = _s2d_bn_relu(t, p["bn2"], dt, relu=False)
            res = jnp.pad(hm, ((0, 0), (1, 0), (1, 0), (0, 0)))[:, :rh, :rw, :]
            h = nn.relu(t + res)
            shift += 2
        return _d2s_extract(h, shift, hh, ww, c)

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        dt = self.dtype
        x = x.astype(dt)

        # stem: 2x stride-2 conv + 4 Bottlenecks (hrnet.py:471-478)
        x = _conv(64, 3, 2, dtype=dt, name="conv1")(x)
        x = _bn(dt, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(64, 3, 2, dtype=dt, name="conv2")(x)
        x = _bn(dt, "bn2")(x, use_running_average=not train)
        x = nn.relu(x)
        for k in range(4):
            x = Bottleneck(64, downsample=(k == 0), dtype=dt, name=f"layer1_{k}")(x, train)
        features_stem = x  # 256 channels @ 1/4

        xs = [x]
        prev_channels = [256]
        features_stage = []
        for si, (num_modules, num_branches, num_blocks, num_channels) in enumerate(spec.stages):
            # transition (hrnet.py:388-421)
            new_xs = []
            for i in range(num_branches):
                if i < len(prev_channels):
                    if prev_channels[i] != num_channels[i]:
                        t = _conv(num_channels[i], 3, dtype=dt, name=f"transition{si + 1}_{i}_conv")(xs[i])
                        t = _bn(dt, f"transition{si + 1}_{i}_bn")(t, use_running_average=not train)
                        new_xs.append(nn.relu(t))
                    else:
                        new_xs.append(xs[i])
                else:
                    t = xs[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        ch = num_channels[i] if j == i - len(prev_channels) else prev_channels[-1]
                        t = _conv(ch, 3, 2, dtype=dt, name=f"transition{si + 1}_{i}_{j}_conv")(t)
                        t = _bn(dt, f"transition{si + 1}_{i}_{j}_bn")(t, use_running_average=not train)
                        t = nn.relu(t)
                    new_xs.append(t)
            xs = new_xs
            # modules
            for m in range(num_modules):
                last_module = m == num_modules - 1
                is_last_stage = si == len(spec.stages) - 1
                multi_scale = not (is_last_stage and last_module)
                xs = HighResolutionModule(
                    num_branches,
                    num_blocks,
                    num_channels,
                    multi_scale_output=multi_scale,
                    dtype=dt,
                    name=f"stage{si + 2}_{m}",
                )(xs, train)
            features_stage.append(xs[0])
            prev_channels = list(num_channels[: len(xs)])

        x = xs[0]
        features_small = x
        dim_tag = spec.num_joints if spec.tag_per_joint else 1

        final_outputs = []
        out_ch = spec.num_joints + dim_tag if spec.with_ae_loss[0] else spec.num_joints
        y = nn.Conv(
            out_ch,
            (spec.final_conv_kernel,) * 2,
            padding="SAME" if spec.final_conv_kernel == 3 else "VALID",
            use_bias=True,
            dtype=dt,
            name="final_layers_0",
        )(x)
        final_outputs.append(y)

        for i in range(spec.num_deconvs):
            if spec.deconv_cat_output[i]:
                x = jnp.concatenate([x, y], axis=-1)
            use_s2d = (
                spec.s2d_eval
                and not train
                and spec.deconv_kernel[i] == 4
            )
            if use_s2d:
                x = self._deconv_branch_s2d(x, i)
            else:
                # ConvTranspose k4 s2 p1 == exact 2x upsample (hrnet.py:354-365)
                # transpose_kernel=True matches torch ConvTranspose2d semantics
                # (gradient-of-conv; kernel stored (k, k, out, in))
                x = nn.ConvTranspose(
                    spec.deconv_channels[i],
                    (spec.deconv_kernel[i],) * 2,
                    strides=(2, 2),
                    padding="SAME",
                    transpose_kernel=True,
                    use_bias=False,
                    dtype=dt,
                    name=f"deconv_{i}_conv",
                )(x)
                x = _bn(dt, f"deconv_{i}_bn")(x, use_running_average=not train)
                x = nn.relu(x)
                for k in range(spec.deconv_num_basic_blocks):
                    x = BasicBlock(spec.deconv_channels[i], dtype=dt, name=f"deconv_{i}_block{k}")(x, train)
            out_ch = (
                spec.num_joints + dim_tag if spec.with_ae_loss[i + 1] else spec.num_joints
            )
            y = nn.Conv(
                out_ch,
                (spec.final_conv_kernel,) * 2,
                padding="SAME" if spec.final_conv_kernel == 3 else "VALID",
                use_bias=True,
                dtype=dt,
                name=f"final_layers_{i + 1}",
            )(x)
            final_outputs.append(y)

        features_big = x
        features_small = _resize_bilinear(features_small, features_big.shape[1:3])

        fusion = spec.feature_fusion
        if fusion == "pool":
            features = jnp.maximum(features_small, features_big)
        elif fusion == "avg":
            features = (features_big + features_small) / 2
        elif fusion == "small":
            features = features_small
        elif fusion == "large":
            features = features_big
        elif fusion == "cat_multi":
            features = jnp.concatenate(
                [features_stem, features_stage[0], features_stage[1]], axis=-1
            )
            features = _resize_bilinear(features, features_big.shape[1:3])
            features = jnp.concatenate([features, features_small], axis=-1)
        else:
            raise NotImplementedError(fusion)

        return final_outputs, features


def hr_process_output(final_outputs, features, num_joints: int, mode: str):
    """Resize+average the two heatmap heads and slice the tags.

    reference: hrnet.py:587-611 (create_process_func_hr).
    Returns (scoremaps, features, tags), all NHWC.
    """
    scoremap_1, scoremap_2 = final_outputs
    if mode in ("avg", "small"):
        scoremap_1 = _resize_bilinear(scoremap_1, scoremap_2.shape[1:3])
    tags = scoremap_1[..., num_joints:]
    if mode == "avg":
        scoremaps = (scoremap_2 + scoremap_1[..., :num_joints]) / 2
    elif mode == "small":
        # the reference leaves the tag channels attached here (hrnet.py:604);
        # downstream code indexes the first num_joints anyway, so slice
        scoremaps = scoremap_1[..., :num_joints]
    elif mode == "large":
        scoremaps = scoremap_2
    else:
        raise NotImplementedError(mode)
    return scoremaps, features, tags
