"""Shims that let the *actual* reference MPN code run on plain CPU torch.

The reference (`/root/reference/src/Models/MessagePassingNetwork/`) depends on
torch_geometric / torch_scatter / a spurious Cython import, none of which are
installed. These are thin functional stand-ins covering exactly the API
surface the reference files use, so golden tests compare our JAX models
against the reference's real code instead of a hand-written twin.

Covered surface (reference: layers.py:1-5, utils.py:1-3):
  * torch_scatter.scatter(src, index, dim=0, reduce=..., dim_size=...)
  * torch_scatter.scatter_max / scatter_softmax
  * torch_geometric.nn.MessagePassing (init(aggr), propagate/message/
    aggregate/update with _i/_j suffix resolution)
  * Cython.Includes (dead import in utils.py:3)
"""

from __future__ import annotations

import importlib.util
import inspect
import sys
import types

import torch

REF_MPN_DIR = "/root/reference/src/Models/MessagePassingNetwork"

# module-name roots that reference-shim fixtures install or replace
_SHIM_ROOTS = frozenset(
    {
        "Utils", "graph_constructor", "Models", "torch_geometric",
        "torch_scatter", "torch_cluster", "cv2", "munkres", "torchvision",
        "mmcv", "ref_group_hg", "config",
    }
)
_SHIM_EXACT = frozenset({"torch.utils.tensorboard"})


def restore_modules(saved: dict) -> None:
    """Teardown for reference-shim fixtures.

    Removes ONLY the shim/reference-tree modules the fixture installed and
    restores any entries it replaced. A blanket "delete everything not in
    the snapshot" teardown also evicts innocent third-party modules that
    were lazily imported while the fixture was live (scipy.sparse.csgraph
    cython pieces, jaxlib.mlir dialect bindings, torch internals); their
    NEXT import re-runs C-extension init, which raises ("Dialect namespace
    'builtin' is already registered") or segfaults outright — this was a
    real order-dependent suite crash, not a theoretical one.
    """
    for k in list(sys.modules):
        if not (k.split(".")[0] in _SHIM_ROOTS or k in _SHIM_EXACT):
            continue
        if k in saved:
            sys.modules[k] = saved[k]
        else:
            del sys.modules[k]


# ---------------------------------------------------------------- scatter ops
def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    assert dim in (0, -src.dim()) or dim == 0, "shim supports dim=0"
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = (dim_size,) + tuple(src.shape[1:])
    if reduce in ("sum", "add"):
        o = torch.zeros(shape, dtype=src.dtype)
        o.index_add_(0, index, src)
    elif reduce == "mean":
        o = torch.zeros(shape, dtype=src.dtype)
        o.index_add_(0, index, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype)
        cnt.index_add_(0, index, torch.ones(index.shape, dtype=src.dtype))
        cnt = cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
        o = o / cnt
    elif reduce in ("max", "min"):
        # torch_scatter semantics: untouched rows are 0
        fill = float("-inf") if reduce == "max" else float("inf")
        o = torch.full(shape, fill, dtype=src.dtype)
        o = o.index_reduce_(0, index, src, "amax" if reduce == "max" else "amin")
        o = torch.where(torch.isinf(o), torch.zeros_like(o), o)
    else:
        raise NotImplementedError(reduce)
    if out is not None:
        out.copy_(o)
        return out
    return o


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    o = scatter(src, index, dim=dim, dim_size=dim_size, reduce="max")
    if dim_size is None:
        dim_size = o.shape[0]
    arg = torch.full((dim_size,) + tuple(src.shape[1:]), dim_size, dtype=torch.long)
    return o, arg


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    return scatter(src, index, dim=dim, dim_size=dim_size, reduce="mean")


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    return scatter(src, index, dim=dim, dim_size=dim_size, reduce="add")


def scatter_softmax(src, index, dim=0, dim_size=None):
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    mx = torch.full((dim_size,) + tuple(src.shape[1:]), float("-inf"), dtype=src.dtype)
    mx = mx.index_reduce_(0, index, src, "amax")
    e = torch.exp(src - mx[index])
    denom = torch.zeros_like(mx).index_add_(0, index, e)
    return e / denom[index]


# --------------------------------------------------- MessagePassing stand-in
class MessagePassing(torch.nn.Module):
    """Functional stand-in for torch_geometric.nn.MessagePassing.

    Default source_to_target flow: edge_index[0]=j (source),
    edge_index[1]=i (target); *_i gathers at targets, *_j at sources;
    aggregation index = targets. Matches the reference's usage
    (layers.py:66,210: "j, i = edge_index  # message is from j to i").
    """

    def __init__(self, aggr="add", **kwargs):
        super().__init__()
        self.aggr = aggr

    def propagate(self, edge_index, size=None, **kwargs):
        j, i = edge_index[0], edge_index[1]
        num_nodes = (size[1] if size is not None
                     else int(kwargs["x"].shape[0]))

        _MISSING = object()

        def resolve(name):
            if name.endswith("_i") and name[:-2] in kwargs:
                return kwargs[name[:-2]][i]
            if name.endswith("_j") and name[:-2] in kwargs:
                return kwargs[name[:-2]][j]
            if name == "index":
                return i
            if name == "num_nodes" and name not in kwargs:
                return num_nodes
            return kwargs.get(name, _MISSING)

        def bind(fn, skip):
            out = {}
            for n, p in inspect.signature(fn).parameters.items():
                if n in skip:
                    continue
                v = resolve(n)
                if v is _MISSING:
                    if p.default is inspect.Parameter.empty:
                        raise KeyError(f"propagate: cannot resolve '{n}'")
                    continue
                out[n] = v
            return out

        out = self.message(**bind(self.message, ()))
        out = self.aggregate(out, **bind(self.aggregate, ("inputs",)))
        return self.update(out, **bind(self.update, ("aggr_out",)))

    def message(self, x_j):  # pragma: no cover - overridden
        return x_j

    def aggregate(self, inputs, index, num_nodes=None):
        n = num_nodes if num_nodes is not None else int(index.max()) + 1
        return scatter(inputs, index, dim=0, dim_size=n, reduce=self.aggr)

    def update(self, aggr_out):
        return aggr_out


def install_shims():
    """Register torch_scatter / torch_geometric / Cython stand-ins."""
    ts = types.ModuleType("torch_scatter")
    ts.scatter = scatter
    ts.scatter_max = scatter_max
    ts.scatter_mean = scatter_mean
    ts.scatter_add = scatter_add
    ts.scatter_softmax = scatter_softmax
    sys.modules.setdefault("torch_scatter", ts)

    tg = types.ModuleType("torch_geometric")
    tgnn = types.ModuleType("torch_geometric.nn")
    tgnn.MessagePassing = MessagePassing
    tg.nn = tgnn
    gutils = types.ModuleType("torch_geometric.utils")

    def _subgraph(*a, **k):  # pragma: no cover - import-time stub only
        raise NotImplementedError("torch_geometric.utils.subgraph stub")

    gutils.subgraph = _subgraph
    gutils.add_self_loops = _subgraph  # import-time stubs (VanillaMPN2.py:4)
    gutils.degree = _subgraph
    tg.utils = gutils
    tgdata = types.ModuleType("torch_geometric.data")

    class _Data:  # pragma: no cover - import-time stub only (VanillaMPN2.py:3)
        pass

    tgdata.Data = _Data
    tg.data = tgdata
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.nn", tgnn)
    sys.modules.setdefault("torch_geometric.utils", gutils)
    sys.modules.setdefault("torch_geometric.data", tgdata)

    cy = types.ModuleType("Cython")
    cyinc = types.ModuleType("Cython.Includes")
    import numpy as _np

    cyinc.numpy = _np
    cy.Includes = cyinc
    sys.modules.setdefault("Cython", cy)
    sys.modules.setdefault("Cython.Includes", cyinc)


def load_ref_graph_constructor():
    """Load the reference graph_constructor/ConstructGraph.py.

    Its label-construction methods (_construct_edge_labels_*, match_cc,
    create_loss_mask — ConstructGraph.py:475-1158) need only torch/scipy/
    numpy; the torch_geometric and Utils.Utils imports are satisfied with
    stubs (they are used only by graph building / node dropout, which the
    golden tests don't exercise).
    """
    install_shims()
    if "Utils.Utils" not in sys.modules:
        up = types.ModuleType("Utils")
        up.__path__ = []
        uu = types.ModuleType("Utils.Utils")

        def non_maximum_suppression(*a, **k):  # pragma: no cover
            raise NotImplementedError("stub")

        def subgraph_mask(*a, **k):  # pragma: no cover
            raise NotImplementedError("stub")

        uu.non_maximum_suppression = non_maximum_suppression
        uu.subgraph_mask = subgraph_mask
        up.Utils = uu
        sys.modules["Utils"] = up
        sys.modules["Utils.Utils"] = uu

    full = "ref_constructgraph"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, "/root/reference/src/graph_constructor/ConstructGraph.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def make_ref_label_constructor(
    hw=(128, 128),
    num_joints=17,
    matching_radius=0.5,
    inclusion_radius=0.75,
    use_neighbours=False,
    with_background=False,
):
    """Reference NaiveGraphConstructor with only the attrs the label methods
    read (bypasses __init__, which wants full batched tensors + config)."""
    cg = load_ref_graph_constructor()
    gc = cg.NaiveGraphConstructor.__new__(cg.NaiveGraphConstructor)
    gc.use_gt = False
    gc.device = torch.device("cpu")
    gc.num_joints = num_joints
    gc.matching_radius = matching_radius
    gc.inclusion_radius = inclusion_radius
    gc.include_neighbouring_keypoints = use_neighbours
    gc.with_background_class = with_background
    # only .shape[2:4] is read (clamp bound)
    gc.scoremaps = torch.zeros(1, num_joints, hw[0], hw[1])
    return gc


def load_ref_hourglass():
    """Load the reference Hourglass backbone (reference: src/Models/
    Hourglass/Hourglass.py:39-91, Layers.py:1-88) — plain torch + a cv2
    import stub."""
    install_shims()
    if "cv2" not in sys.modules:
        sys.modules["cv2"] = types.ModuleType("cv2")
    if "Models.Hourglass" not in sys.modules:
        mp = types.ModuleType("Models")
        mp.__path__ = ["/root/reference/src/Models"]
        mh = types.ModuleType("Models.Hourglass")
        mh.__path__ = ["/root/reference/src/Models/Hourglass"]
        sys.modules.setdefault("Models", mp)
        sys.modules["Models.Hourglass"] = mh
    for name in ("Layers", "Hourglass"):
        full = f"Models.Hourglass.{name}"
        if full not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                full, f"/root/reference/src/Models/Hourglass/{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[full] = mod
            spec.loader.exec_module(mod)
    return sys.modules["Models.Hourglass.Hourglass"]


def load_ref_losses():
    """Load the reference src/Utils/loss.py (reference: loss.py:1-936)."""
    install_shims()
    full = "ref_losses"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, "/root/reference/src/Utils/loss.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def install_mmcv_shim():
    """Minimal pure-torch stand-ins for the mmcv.cnn surface the reference
    mmpose package uses (reference: src/Models/HigherHRNet/mmpose/
    backbone.py:2-3, resnet.py:3-4, keypoint_head.py:3-4)."""
    if "mmcv" in sys.modules:
        return

    def build_conv_layer(cfg, *args, **kwargs):
        assert cfg is None or cfg.get("type", "Conv2d") == "Conv2d", cfg
        return torch.nn.Conv2d(*args, **kwargs)

    def build_norm_layer(cfg, num_features, postfix=""):
        cfg = dict(cfg or {"type": "BN"})
        assert cfg.get("type", "BN") in ("BN", "BN2d", "SyncBN"), cfg
        layer = torch.nn.BatchNorm2d(num_features)
        requires_grad = cfg.get("requires_grad", True)
        for p in layer.parameters():
            p.requires_grad = requires_grad
        return "bn" + str(postfix), layer

    def build_upsample_layer(cfg, *args, **kwargs):
        assert cfg.get("type") == "deconv", cfg
        return torch.nn.ConvTranspose2d(*args, **kwargs)

    def constant_init(module, val, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            torch.nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            torch.nn.init.constant_(module.bias, bias)

    def normal_init(module, mean=0, std=1, bias=0):
        torch.nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            torch.nn.init.constant_(module.bias, bias)

    def kaiming_init(
        module, a=0, mode="fan_out", nonlinearity="relu", bias=0,
        distribution="normal",
    ):
        if distribution == "normal":
            torch.nn.init.kaiming_normal_(
                module.weight, a=a, mode=mode, nonlinearity=nonlinearity
            )
        else:
            torch.nn.init.kaiming_uniform_(
                module.weight, a=a, mode=mode, nonlinearity=nonlinearity
            )
        if hasattr(module, "bias") and module.bias is not None:
            torch.nn.init.constant_(module.bias, bias)

    class ConvModule(torch.nn.Module):
        """conv + optional BN + optional ReLU (imported by resnet.py but
        not instantiated on the HRNet path; kept functional for safety)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias="auto",
                     conv_cfg=None, norm_cfg=None, act_cfg=None, **kwargs):
            super().__init__()
            if act_cfg is None:
                act_cfg = dict(type="ReLU")
            use_bias = bias if bias != "auto" else norm_cfg is None
            self.conv = torch.nn.Conv2d(
                in_channels, out_channels, kernel_size, stride=stride,
                padding=padding, dilation=dilation, groups=groups, bias=use_bias,
            )
            self.bn = torch.nn.BatchNorm2d(out_channels) if norm_cfg else None
            self.activate = torch.nn.ReLU(inplace=True) if act_cfg else None

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            if self.activate is not None:
                x = self.activate(x)
            return x

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    cnn.build_conv_layer = build_conv_layer
    cnn.build_norm_layer = build_norm_layer
    cnn.build_upsample_layer = build_upsample_layer
    cnn.constant_init = constant_init
    cnn.normal_init = normal_init
    cnn.kaiming_init = kaiming_init
    cnn.ConvModule = ConvModule
    mmcv.cnn = cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn


def load_ref_mmpose():
    """Load the reference mmpose package (reference: src/Models/HigherHRNet/
    mmpose/) under an mmcv shim; returns the higher_hr_net module with
    get_mmpose_hrnet/BottomUp."""
    install_mmcv_shim()
    pkg_dir = "/root/reference/src/Models/HigherHRNet/mmpose"
    pkg = "ref_mmpose"
    if pkg not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            pkg, f"{pkg_dir}/__init__.py", submodule_search_locations=[pkg_dir]
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[pkg] = mod
        spec.loader.exec_module(mod)
    full = f"{pkg}.higher_hr_net"
    if full not in sys.modules:
        import importlib as _il

        _il.import_module(full)
    return sys.modules[full]


def load_ref_module(name: str, pkg: str = "ref_mpn"):
    """Load a reference MPN module by filename (no .py) under a fake package
    so its relative imports (.layers, .utils) resolve."""
    install_shims()
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [REF_MPN_DIR]
        sys.modules[pkg] = p
    full = f"{pkg}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, f"{REF_MPN_DIR}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
