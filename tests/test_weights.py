"""Weight-conversion parity tests (SURVEY.md hard part 4).

Torch is available in this environment (no checkpoints are — zero
egress), so each converter is proven by round-trip: build a torch
MIRROR of the architecture with the ORIGINAL checkpoint naming
(cellpose resnet_torch CPnet / timm tf_efficientnetv2), randomize its
weights AND BatchNorm running statistics, convert the state dict
through the concrete name maps, and assert activation parity <=1e-5.
When a real checkpoint file appears it converts through the exact same
path (shape mismatches raise, unmatched keys are reported).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from saguaro_tpu.models.cellpose import CellposeConfig, CellposeUNet
from saguaro_tpu.models.cellpose_weights import (
    cellpose_name_map,
    convert_cellpose_state_dict,
)
from saguaro_tpu.models.effnet_weights import (
    convert_effnet_state_dict,
    effnet_name_map,
)
from saguaro_tpu.models.effnetv2 import EffNetV2, EffNetV2Config, StageSpec
from saguaro_tpu.models.weights import flatten_tree

# ----------------------------------------------------------------------------
# torch mirror of cellpose CPnet (original module naming)
# ----------------------------------------------------------------------------


def _batchconv(cin, cout, sz):
    return tnn.Sequential(
        tnn.BatchNorm2d(cin, eps=1e-5),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


def _batchconv0(cin, cout, sz):
    return tnn.Sequential(
        tnn.BatchNorm2d(cin, eps=1e-5),
        tnn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


class _TResDown(tnn.Module):
    def __init__(self, cin, cout, sz):
        super().__init__()
        self.conv = tnn.Sequential()
        self.proj = _batchconv0(cin, cout, 1)
        for t in range(4):
            self.conv.add_module(
                f"conv_{t}", _batchconv(cin if t == 0 else cout, cout, sz)
            )

    def forward(self, x):
        x = self.proj(x) + self.conv[1](self.conv[0](x))
        return x + self.conv[3](self.conv[2](x))


class _TConvStyle(tnn.Module):
    def __init__(self, cin, cout, style_ch, sz):
        super().__init__()
        self.conv = _batchconv(cin, cout, sz)
        self.full = tnn.Linear(style_ch, cout)

    def forward(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = self.full(style)
        return self.conv(x + feat.unsqueeze(-1).unsqueeze(-1))


class _TResUp(tnn.Module):
    def __init__(self, cin, cout, style_ch, sz):
        super().__init__()
        self.conv = tnn.Sequential()
        self.conv.add_module("conv_0", _batchconv(cin, cout, sz))
        for t in range(1, 4):
            self.conv.add_module(f"conv_{t}", _TConvStyle(cout, cout, style_ch, sz))
        self.proj = _batchconv0(cin, cout, 1)

    def forward(self, x, y, style):
        x = self.proj(x) + self.conv[1](style, self.conv[0](x), y=y)
        return x + self.conv[3](style, self.conv[2](style, x))


class _TDownsample(tnn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.down = tnn.Sequential()
        self.maxpool = tnn.MaxPool2d(2, stride=2)
        for n in range(len(nbase) - 1):
            self.down.add_module(f"res_down_{n}", _TResDown(nbase[n], nbase[n + 1], sz))

    def forward(self, x):
        xd = []
        for n in range(len(self.down)):
            y = self.maxpool(xd[n - 1]) if n > 0 else x
            xd.append(self.down[n](y))
        return xd


class _TUpsample(tnn.Module):
    def __init__(self, nbaseup, sz):
        super().__init__()
        self.upsampling = tnn.Upsample(scale_factor=2, mode="nearest")
        self.up = tnn.Sequential()
        for n in range(1, len(nbaseup)):
            self.up.add_module(
                f"res_up_{n - 1}", _TResUp(nbaseup[n], nbaseup[n - 1], nbaseup[-1], sz)
            )

    def forward(self, style, xd):
        x = self.up[-1](xd[-1], xd[-1], style)
        for n in range(len(self.up) - 2, -1, -1):
            x = self.upsampling(x)
            x = self.up[n](x, xd[n], style)
        return x


class TCPnet(tnn.Module):
    """CPnet mirror: nbase e.g. [2, 32, 64, 128, 256], nout=3, sz=3."""

    def __init__(self, nbase, nout=3, sz=3):
        super().__init__()
        self.downsample = _TDownsample(nbase, sz)
        nbaseup = nbase[1:] + [nbase[-1]]
        self.upsample = _TUpsample(nbaseup, sz)
        self.output = _batchconv(nbaseup[0], nout, 1)

    def forward(self, x):
        xd = self.downsample(x)
        style = F.avg_pool2d(xd[-1], kernel_size=xd[-1].shape[-2:]).flatten(1)
        style = style / torch.sum(style**2, dim=1, keepdim=True) ** 0.5
        return self.output(self.upsample(style, xd))


def _randomize_bn_stats(module, rng):
    """Give every BatchNorm non-trivial running statistics."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.tensor(rng.normal(0, 0.5, m.running_mean.shape), dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(rng.uniform(0.5, 2.0, m.running_var.shape), dtype=torch.float32)
            )


class TestCellposeParity:
    def test_activation_parity(self, rng):
        nbase = [2, 4, 8, 16]
        cfg = CellposeConfig(
            n_channels=2, features=(4, 8, 16), tile=32, compute_dtype="float32"
        )
        tmodel = TCPnet(nbase)
        tmodel.eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, rng)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        model = CellposeUNet(cfg)
        import jax

        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 2), np.float32)
        )
        converted = convert_cellpose_state_dict(sd, variables, cfg)

        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        # XLA:CPU convs run reduced-precision by default in this build
        with jax.default_matmul_precision("highest"):
            got = np.moveaxis(np.asarray(model.apply(converted, x)), -1, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_name_map_covers_state_dict(self):
        """Every tensor in a CPnet state dict is consumed by the map, and
        every flax leaf is assigned (no silent init leftovers)."""
        nbase = [2, 4, 8, 16]
        cfg = CellposeConfig(n_channels=2, features=(4, 8, 16), tile=32)
        sd_keys = set(TCPnet(nbase).state_dict().keys())
        sd_keys = {k for k in sd_keys if not k.endswith("num_batches_tracked")}
        m = cellpose_name_map(cfg)
        assert set(m.values()) == sd_keys

        import jax

        model = CellposeUNet(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 2), np.float32)
        )
        assert set(m.keys()) == set(flatten_tree(variables).keys())


# ----------------------------------------------------------------------------
# torch mirror of timm tf_efficientnetv2 (original block naming)
# ----------------------------------------------------------------------------


def _conv2d_same(x, weight, stride=1, groups=1):
    """TF-SAME conv, asymmetric padding (timm Conv2dSame semantics)."""
    ih, iw = x.shape[-2:]
    kh, kw = weight.shape[-2:]
    pad_h = max((-ih) % stride + kh - stride if ih % stride == 0 else kh - ih % stride, 0)
    pad_h = max((kh - stride) if ih % stride == 0 else (kh - ih % stride), 0)
    pad_w = max((kw - stride) if iw % stride == 0 else (kw - iw % stride), 0)
    x = F.pad(x, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2))
    return F.conv2d(x, weight, stride=stride, groups=groups)


class _TConvSame(tnn.Conv2d):
    def __init__(self, cin, cout, k, stride=1, groups=1):
        super().__init__(cin, cout, k, stride=stride, groups=groups, bias=False)

    def forward(self, x):
        return _conv2d_same(x, self.weight, self.stride[0], self.groups)


def _tbn(c):
    return tnn.BatchNorm2d(c, eps=1e-3)


class _TConvBnAct(tnn.Module):  # timm ConvBnAct (fused, expand=1, '_skip')
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv = _TConvSame(cin, cout, k, stride)
        self.bn1 = _tbn(cout)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv(x)))
        return x + h if self.has_skip else h


class _TEdgeResidual(tnn.Module):  # timm EdgeResidual (fused, expand>1)
    def __init__(self, cin, cout, k, stride, expand):
        super().__init__()
        mid = cin * expand
        self.conv_exp = _TConvSame(cin, mid, k, stride)
        self.bn1 = _tbn(mid)
        self.conv_pwl = _TConvSame(mid, cout, 1)
        self.bn2 = _tbn(cout)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_exp(x)))
        h = self.bn2(self.conv_pwl(h))
        return x + h if self.has_skip else h


class _TSE(tnn.Module):
    def __init__(self, mid, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(mid, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, mid, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _TInvertedResidual(tnn.Module):  # timm InvertedResidual (MBConv)
    def __init__(self, cin, cout, k, stride, expand, se_ratio):
        super().__init__()
        mid = cin * expand
        self.conv_pw = _TConvSame(cin, mid, 1)
        self.bn1 = _tbn(mid)
        self.conv_dw = _TConvSame(mid, mid, k, stride, groups=mid)
        self.bn2 = _tbn(mid)
        self.se = _TSE(mid, max(1, int(cin * se_ratio)))
        self.conv_pwl = _TConvSame(mid, cout, 1)
        self.bn3 = _tbn(cout)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return x + h if self.has_skip else h


class TEffNetV2(tnn.Module):
    """timm efficientnetv2 mirror driven by an EffNetV2Config."""

    def __init__(self, config: EffNetV2Config):
        super().__init__()
        self.conv_stem = _TConvSame(3, config.stem_filters, 3, 2)
        self.bn1 = _tbn(config.stem_filters)
        self.blocks = tnn.ModuleList()
        cin = config.stem_filters
        for spec in config.stages:
            stage = tnn.ModuleList()
            for i in range(spec.count):
                stride = spec.stride if i == 0 else 1
                if spec.block == "fused" and spec.expand == 1:
                    stage.append(_TConvBnAct(cin, spec.filters, spec.kernel, stride))
                elif spec.block == "fused":
                    stage.append(
                        _TEdgeResidual(cin, spec.filters, spec.kernel, stride, spec.expand)
                    )
                else:
                    stage.append(
                        _TInvertedResidual(
                            cin, spec.filters, spec.kernel, stride, spec.expand, spec.se_ratio
                        )
                    )
                cin = spec.filters
            self.blocks.append(stage)
        self.conv_head = _TConvSame(cin, config.head_filters, 1)
        self.bn2 = _tbn(config.head_filters)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        for stage in self.blocks:
            for block in stage:
                x = block(x)
        x = F.silu(self.bn2(self.conv_head(x)))
        return x.mean((2, 3))  # pooler_output


TINY_EFFNET = EffNetV2Config(
    stem_filters=4,
    stages=(
        StageSpec("fused", 1, 3, 1, 4, 2),
        StageSpec("fused", 4, 3, 2, 8, 2),
        StageSpec("mbconv", 4, 3, 2, 12, 2, 0.25),
    ),
    head_filters=32,
    input_size=32,
    compute_dtype="float32",
)


class TestEffNetParity:
    def test_activation_parity(self, rng):
        tmodel = TEffNetV2(TINY_EFFNET)
        tmodel.eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, rng)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        import jax

        model = EffNetV2(TINY_EFFNET)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
        )
        converted = convert_effnet_state_dict(sd, variables, TINY_EFFNET)

        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(model.apply(converted, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_timm_wrapper_prefix_stripped(self, rng):
        tmodel = TEffNetV2(TINY_EFFNET)
        tmodel.eval()
        sd = {
            f"timm_model.{k}": v.detach().numpy()
            for k, v in tmodel.state_dict().items()
        }
        import jax

        model = EffNetV2(TINY_EFFNET)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
        )
        converted = convert_effnet_state_dict(sd, variables, TINY_EFFNET)
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(model.apply(converted, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_name_map_covers_state_dict(self):
        sd_keys = {
            k
            for k in TEffNetV2(TINY_EFFNET).state_dict().keys()
            if not k.endswith("num_batches_tracked")
        }
        m = effnet_name_map(TINY_EFFNET)
        assert set(m.values()) == sd_keys

        import jax

        model = EffNetV2(TINY_EFFNET)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
        )
        assert set(m.keys()) == set(flatten_tree(variables).keys())

    def test_full_l_map_is_well_formed(self):
        """The production EFFNETV2_L map: right cardinality, unique keys."""
        from saguaro_tpu.models.effnetv2 import EFFNETV2_L

        m = effnet_name_map(EFFNETV2_L)
        assert len(set(m.values())) == len(m)
        # L has 79 blocks: 4+7+7 fused + 10+19+25+7 mbconv
        assert sum(1 for k in m.values() if k.startswith("blocks.")) > 700

    def test_bn_folding_preserves_outputs(self, rng):
        """fold_batchnorm: the fold_bn=True graph with folded weights
        reproduces the unfolded graph exactly (f32 compute; the engine's
        bf16 path adds only one fewer rounding per conv)."""
        import dataclasses

        import jax

        from saguaro_tpu.models.effnetv2 import fold_batchnorm

        model = EffNetV2(TINY_EFFNET)
        variables = model.init(
            jax.random.PRNGKey(1), np.zeros((1, 32, 32, 3), np.float32)
        )
        # non-trivial running statistics so the fold actually moves weights
        stats = variables["batch_stats"]
        leaves, treedef = jax.tree.flatten(stats)
        variables = dict(variables)
        variables["batch_stats"] = jax.tree.unflatten(
            treedef,
            [
                np.abs(rng.normal(0.8, 0.3, l.shape)).astype(np.float32) + 0.1
                for l in leaves
            ],
        )
        folded_model = EffNetV2(dataclasses.replace(TINY_EFFNET, fold_bn=True))
        folded = fold_batchnorm(variables)
        # the folded tree matches the folded architecture's own init structure
        ref = folded_model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
        )
        assert set(flatten_tree(folded)) == set(flatten_tree(ref))

        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            want = np.asarray(model.apply(variables, x))
            got = np.asarray(folded_model.apply(folded, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestEngineTorchCheckpoint:
    def test_engine_loads_torch_cpnet_file(self, rng, tmp_path):
        """SegmentEmbedConfig.cellpose_checkpoint accepts a raw torch CPnet
        save (the 'nuclei' file format) and converts it on construction."""
        from saguaro_tpu.models.effnetv2 import EffNetV2Config, StageSpec
        from saguaro_tpu.pipeline.segment_embed import (
            SegmentEmbedConfig,
            SegmentEmbedEngine,
        )

        nbase = [2, 4, 8, 16]
        tmodel = TCPnet(nbase)
        tmodel.eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, rng)
        path = str(tmp_path / "nuclei_mirror.pt")
        torch.save(tmodel.state_dict(), path)

        cfg = SegmentEmbedConfig(
            channels=["DNA"],
            cellpose_checkpoint=path,
            cellpose=CellposeConfig(
                n_channels=2, features=(4, 8, 16), tile=32, compute_dtype="float32"
            ),
            effnet=EffNetV2Config(
                stem_filters=4,
                stages=(StageSpec("fused", 1, 3, 1, 4, 1),),
                head_filters=1280, input_size=32,
            ),
        )
        engine = SegmentEmbedEngine(cfg, seed=0)
        x = rng.normal(size=(1, 32, 32, 2)).astype(np.float32)
        import jax

        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.moveaxis(
                np.asarray(engine.cell_model.apply(engine.cell_vars, x)), -1, 1
            )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestConvertByOrder:
    def test_structural_pairing(self, rng):
        """The order-based fallback pairs a renamed state dict correctly."""
        from saguaro_tpu.models.weights import convert_by_order

        tmodel = TEffNetV2(TINY_EFFNET)
        tmodel.eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, rng)
        sd = {
            f"totally.renamed.{i}.{k}": v.detach().numpy()
            for i, (k, v) in enumerate(tmodel.state_dict().items())
        }
        import jax

        from saguaro_tpu.models.effnetv2 import EffNetV2

        model = EffNetV2(TINY_EFFNET)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
        )
        converted, report = convert_by_order(
            sd, variables, skip_torch=lambda k: k.endswith("num_batches_tracked")
        )
        unmatched = [r for r in report if r.startswith("UNMATCHED")]
        assert not unmatched, unmatched
        # pairing must be semantically right, not just complete: activations
        # match the torch model (catches BN weight<->running_mean swaps)
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(model.apply(converted, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestFullScaleEffNetL:
    """Full-size EFFNETV2_L conversion dress rehearsal (VERDICT r3 item 8):
    the production conversion path — timm-named torch mirror (~118M
    params, random weights) -> convert_effnet_state_dict -> BN fold +
    gray-stem fold -> one embed chunk through the engine — exercised at
    full scale, not just tiny configs (Cellpose_GPU_s3fs.py:27,109-110).

    Runs in a FRESH SUBPROCESS: after ~290 suite tests in one process,
    XLA:CPU deterministically SEGFAULTS compiling the full-L
    fold_batchnorm program (jax 0.9.0, 2026-08-20 — faulthandler points
    into backend_compile_and_load; the identical test passes in a fresh
    interpreter, so the crash is accumulated in-process compiler/cache
    state, not this code). Subprocess isolation keeps the one-command
    suite green AND keeps the dress rehearsal at full scale.
    """

    def test_full_l_convert_fold_embed(self, rng):
        import os
        import subprocess
        import sys

        if os.environ.get("SAGUARO_FULL_L_INNER") != "1":
            env = dict(os.environ, SAGUARO_FULL_L_INNER="1")
            r = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "pytest",
                    "-q",
                    "-p",
                    "no:cacheprovider",
                    f"{__file__}::TestFullScaleEffNetL::test_full_l_convert_fold_embed",
                ],
                env=env,
                capture_output=True,
                text=True,
                timeout=2400,
            )
            assert r.returncode == 0, (
                f"full-L dress rehearsal failed in subprocess "
                f"(rc={r.returncode}):\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
            )
            return

        import jax

        from saguaro_tpu.models.effnetv2 import EFFNETV2_L, EffNetV2
        from saguaro_tpu.pipeline.segment_embed import (
            SegmentEmbedConfig,
            SegmentEmbedEngine,
        )

        tmodel = TEffNetV2(EFFNETV2_L)
        tmodel.eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, rng)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        n_params = sum(int(np.prod(v.shape)) for v in sd.values())
        assert n_params > 100_000_000, n_params  # full L, not a tiny config

        model = EffNetV2(EFFNETV2_L)
        variables = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                np.zeros((1, EFFNETV2_L.input_size, EFFNETV2_L.input_size, 3),
                         np.float32),
            )
        )
        # materialize zeros matching the shape tree (init at 480^2 is slow)
        variables = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), variables
        )
        converted = convert_effnet_state_dict(sd, variables, EFFNETV2_L)
        conv_leaves = flatten_tree(converted)
        want_leaves = flatten_tree(variables)
        assert set(conv_leaves) == set(want_leaves)
        for k, v in conv_leaves.items():
            assert v.shape == want_leaves[k].shape, k

        # activation parity at a reduced input size (the nets are fully
        # convolutional; 192^2 keeps the torch CPU forward tractable
        # while every one of the 79 blocks runs with its real weights)
        x = rng.normal(size=(1, 192, 192, 3)).astype(np.float32) * 0.1
        with torch.no_grad():
            want = tmodel(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(model.apply(converted, x))
        # depth-79 f32 accumulation drift between XLA and torch conv
        # implementations reaches ~4e-3 absolute on O(1) outputs with
        # random weights; a real conversion error (swapped leaf, bad BN
        # fold) is O(1). Strict precision parity is pinned by the tiny-
        # config test above (<=1e-5); this asserts the full-scale
        # mapping, not arithmetic.
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-3)

        # engine path: BN fold + gray-stem fold + one pooled embed chunk
        cfg = SegmentEmbedConfig(
            channels=["DNA", "ER"], box_size=64, max_cells=8,
            embed_chunk=4, embed_size=192, min_size=3, site_batch=1,
            effnet=EFFNETV2_L,
        )
        engine = SegmentEmbedEngine(cfg, effnet_variables=converted, seed=0)
        h = w = 128
        img = rng.integers(80, 4000, (h, w, 2)).astype(np.uint16)
        lab = np.zeros((h, w), np.int32)
        lab[40:60, 40:60] = 1
        lab[70:100, 70:100] = 2
        per_site = engine.embed_sites_pooled(
            np.stack([img]), [np.asarray(lab, np.int32)]
        )
        feats, coords = per_site[0]
        assert feats.shape == (2, 2, 1280)  # (cells, channels, FEATURE_LENGTH)
        assert np.isfinite(feats).all()
