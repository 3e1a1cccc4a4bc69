"""Torch->Flax pretrained-weight import parity (SURVEY.md R3).

Builds the torch reference encoder (tools/torch_baseline.py, which follows
torchvision ResNet-50 conv arithmetic), translates its random-initialized
state_dict to torchvision naming, grafts it into the Flax encoder, and
asserts the two produce the same feature pyramid on the same input — the
guarantee a user migrating with an ImageNet .pth relies on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cspn_monodepth_tpu.models import ResNetEncoder
from cspn_monodepth_tpu.models.torch_weights import (
    convert_torch_resnet50,
    load_pretrained_encoder,
)
from tools.torch_baseline import Bottleneck as TorchBottleneck


class _TorchEncoder(torch.nn.Module):
    """torchvision-structured ResNet-50 encoder (names: conv1, bn1,
    layer1..layer4 with downsample.{0,1})."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        widths, blocks = [64, 128, 256, 512], [3, 4, 6, 3]
        cin = 64
        for i, (w, nb) in enumerate(zip(widths, blocks), start=1):
            stage = []
            for b in range(nb):
                stride = 2 if i > 1 and b == 0 else 1
                stage.append(TorchBottleneck(cin, w, stride))
                cin = w * 4
            setattr(self, f"layer{i}", torch.nn.Sequential(*stage))

    def forward(self, x):
        stem = F.relu(self.bn1(self.conv1(x)))
        y = F.max_pool2d(stem, 3, 2, 1)
        outs = [stem]
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
            outs.append(y)
        return outs


def _torchvision_names(sd):
    """tools.torch_baseline Bottleneck names 'down.{0,1}' ->
    torchvision 'downsample.{0,1}'."""
    return {k.replace(".down.", ".downsample."): v for k, v in sd.items()}


@pytest.mark.parametrize("in_ch", [3, 4])
def test_encoder_matches_torch_with_ported_weights(in_ch):
    torch.manual_seed(0)
    tenc = _TorchEncoder(3).eval()
    # randomize BN stats so the test exercises them too
    with torch.no_grad():
        for m in tenc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = _torchvision_names(tenc.state_dict())
    enc = ResNetEncoder(dtype=jnp.float32)
    x_np = np.random.default_rng(1).random((1, 64, 96, in_ch)).astype(
        np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, stats = convert_torch_resnet50(sd, in_channels=in_ch)

    # graft via the same merge path used for full models
    fake_model_vars = {"params": {"encoder": variables["params"]},
                       "batch_stats": {"batch_stats_unused": {}}}
    # (direct merge for the encoder-only case)
    from cspn_monodepth_tpu.models.torch_weights import load_pretrained_encoder  # noqa
    merged = {
        "params": __merge(variables["params"], params),
        "batch_stats": __merge(variables["batch_stats"], stats),
    }
    got = enc.apply(merged, jnp.asarray(x_np), train=False)

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        if in_ch == 4:
            # flax conv1 was grafted with the mean-RGB 4th channel; build
            # the same torch-side conv to compare
            w = tenc.conv1.weight
            w4 = torch.cat([w, w.mean(dim=1, keepdim=True)], dim=1)
            tenc4 = _TorchEncoder(4).eval()
            tenc4.load_state_dict(
                {**tenc.state_dict(), "conv1.weight": w4})
            want = tenc4(tx)
        else:
            want = tenc(tx)

    for lvl, (g, w) in enumerate(zip(got, want)):
        w_np = np.transpose(w.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(g), w_np, rtol=2e-4, atol=2e-4,
                                   err_msg=f"pyramid level {lvl}")


def __merge(base, overlay):
    if not isinstance(overlay, dict):
        assert tuple(base.shape) == tuple(overlay.shape)
        return overlay
    out = dict(base)
    for k, v in overlay.items():
        out[k] = __merge(base[k], v)
    return out


def test_load_pretrained_encoder_full_model():
    """End-to-end: graft into full CSPNDepthNet variables; decoder/head
    params must be untouched and the model must still run."""
    from cspn_monodepth_tpu.models import CSPNDepthNet

    torch.manual_seed(1)
    tenc = _TorchEncoder(3).eval()
    sd = _torchvision_names(tenc.state_dict())

    model = CSPNDepthNet(modality="rgbd", num_iters=2, cspn_impl="jnp",
                         dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 4))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x,
                                                  train=False))
    variables = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    new = load_pretrained_encoder(variables, sd, in_channels=4)
    w = new["params"]["encoder"]["conv1"]["kernel"]
    assert w.shape == (7, 7, 4, 64) and float(np.abs(w).max()) > 0
    # decoder untouched (still zeros)
    dec = new["params"]["decoder"]
    assert float(np.abs(jax.tree.leaves(dec)[0]).max()) == 0.0


class _TorchBasicBlock(torch.nn.Module):
    """torchvision BasicBlock (conv1/bn1/conv2/bn2 + downsample)."""

    def __init__(self, cin, w, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(w)
        self.conv2 = torch.nn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, w, 1, stride, bias=False),
                torch.nn.BatchNorm2d(w))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class _TorchEncoder18(torch.nn.Module):
    """torchvision-structured ResNet-18 encoder."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        widths, blocks = [64, 128, 256, 512], [2, 2, 2, 2]
        cin = 64
        for i, (w, nb) in enumerate(zip(widths, blocks), start=1):
            stage = []
            for b in range(nb):
                stride = 2 if i > 1 and b == 0 else 1
                stage.append(_TorchBasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{i}", torch.nn.Sequential(*stage))

    def forward(self, x):
        stem = F.relu(self.bn1(self.conv1(x)))
        y = F.max_pool2d(stem, 3, 2, 1)
        outs = [stem]
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
            outs.append(y)
        return outs


def test_encoder18_matches_torch_with_ported_weights():
    from cspn_monodepth_tpu.models.resnet import ARCHS
    from cspn_monodepth_tpu.models.torch_weights import convert_torch_resnet

    torch.manual_seed(2)
    tenc = _TorchEncoder18().eval()
    with torch.no_grad():
        for m in tenc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    stages, block = ARCHS["resnet18"]
    enc = ResNetEncoder(stage_sizes=stages, block=block, dtype=jnp.float32)
    x_np = np.random.default_rng(3).random((1, 64, 96, 3)).astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, stats = convert_torch_resnet(tenc.state_dict(), in_channels=3,
                                         arch="resnet18")
    merged = {"params": __merge(variables["params"], params),
              "batch_stats": __merge(variables["batch_stats"], stats)}
    got = enc.apply(merged, jnp.asarray(x_np), train=False)

    with torch.no_grad():
        want = tenc(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    for lvl, (g, w) in enumerate(zip(got, want)):
        w_np = np.transpose(w.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(g), w_np, rtol=2e-4, atol=2e-4,
                                   err_msg=f"pyramid level {lvl}")


def test_trainer_pretrained_config(tmp_path):
    """cfg.model.pretrained grafts a torchvision .pth into the encoder at
    Trainer.init_state (the reference's `pretrained=True` flow end-to-end:
    file on disk -> trained state), incl. the rgbd 4th-channel widening."""
    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    torch.manual_seed(5)
    tenc = _TorchEncoder18().eval()
    pth = tmp_path / "resnet18.pth"
    torch.save(tenc.state_dict(), pth)

    cfg = get_config("synthetic_tiny").override(**{
        "model.arch": "resnet18",
        "model.encoder_width": 64,
        "model.decoder_channels": (32, 24, 16, 16),
        "model.pretrained": str(pth),
        "train.checkpoint_dir": str(tmp_path / "ckpt"),
    })
    trainer = Trainer(cfg, workdir=str(tmp_path / "ckpt"))
    state = trainer.init_state()

    # conv1 kernel: (7,7,4,64) NHWC-HWIO; first 3 input channels == the
    # torch filters, 4th == their mean (torch OIHW -> HWIO transpose).
    got = np.asarray(
        jax.tree.leaves({"k": state.params["encoder"]["conv_init"]})[0]
        if "conv_init" in state.params["encoder"]
        else state.params["encoder"]["conv1"]["kernel"])
    want_rgb = np.transpose(tenc.conv1.weight.detach().numpy(),
                            (2, 3, 1, 0))
    np.testing.assert_allclose(got[:, :, :3, :], want_rgb, rtol=1e-6)
    np.testing.assert_allclose(got[:, :, 3, :], want_rgb.mean(axis=2),
                               rtol=1e-6)
