"""Numeric forward parity: flax UNet3D vs a torch twin with shared weights.

SURVEY.md §4 calls for parity tests of JAX modules against recorded torch
activations; here the torch twin is built in-test with the reference's
architecture (models/unet3d.py:14-152, with per-conv norms — see the
documented shared-BN divergence in models/unet3d.py) and its weights are
copied into the flax model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from multimodal_ad_tpu.models.unet3d import UNet3D

LEVELS = (8, 16, 32)
BOTTLENECK = 64


def build_torch_unet():
    class ConvBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, cout // 2, 3, padding=1)
            self.bn1 = tnn.BatchNorm3d(cout // 2)
            self.conv2 = tnn.Conv3d(cout // 2, cout, 3, padding=1)
            self.bn2 = tnn.BatchNorm3d(cout)

        def forward(self, x):
            r = torch.relu(self.bn1(self.conv1(x)))
            return torch.relu(self.bn2(self.conv2(r)))

    class UpBlock(tnn.Module):
        def __init__(self, cin, cres, last=False, num_classes=1):
            super().__init__()
            self.up = tnn.ConvTranspose3d(cin, cin, 2, stride=2)
            self.conv1 = tnn.Conv3d(cin + cres, cin // 2, 3, padding=1)
            self.bn1 = tnn.BatchNorm3d(cin // 2)
            self.conv2 = tnn.Conv3d(cin // 2, cin // 2, 3, padding=1)
            self.bn2 = tnn.BatchNorm3d(cin // 2)
            self.last = last
            if last:
                self.head = tnn.Conv3d(cin // 2, num_classes, 1)

        def forward(self, x, res):
            x = self.up(x)
            x = torch.cat([x, res], dim=1)
            x = torch.relu(self.bn1(self.conv1(x)))
            x = torch.relu(self.bn2(self.conv2(x)))
            if self.last:
                x = self.head(x)
            return x

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            c1, c2, c3 = LEVELS
            self.a1, self.a2, self.a3 = (ConvBlock(1, c1), ConvBlock(c1, c2),
                                         ConvBlock(c2, c3))
            self.bott = ConvBlock(c3, BOTTLENECK)
            self.s3 = UpBlock(BOTTLENECK, c3)
            self.s2 = UpBlock(c3, c2)
            self.s1 = UpBlock(c2, c1, last=True)
            self.pool = tnn.MaxPool3d(2, 2)

        def forward(self, x):
            r1 = self.a1(x)
            r2 = self.a2(self.pool(r1))
            r3 = self.a3(self.pool(r2))
            b = self.bott(self.pool(r3))
            y = self.s3(b, r3)
            y = self.s2(y, r2)
            return self.s1(y, r1)

    return Net()


def copy_weights(tnet, variables):
    """torch state -> flax variables (conv OIDHW->DHWIO, transpose-conv
    IODHW->DHWIO-flipped per flax ConvTranspose convention)."""
    import jax.tree_util as jtu

    p = jax.tree_util.tree_map(np.array, _plain(variables["params"]))
    bs = jax.tree_util.tree_map(np.array, _plain(variables["batch_stats"]))

    def conv(t):  # (O, I, D, H, W) -> (D, H, W, I, O)
        return t.detach().numpy().transpose(2, 3, 4, 1, 0)

    def tconv(t):  # torch ConvTranspose3d weight (I, O, D, H, W)
        return t.detach().numpy().transpose(2, 3, 4, 0, 1)

    def set_convblock(dst_p, dst_bs, src):
        dst_p["Conv_0"]["kernel"] = conv(src.conv1.weight)
        dst_p["Conv_0"]["bias"] = src.conv1.bias.detach().numpy()
        dst_p["BatchNorm_0"]["scale"] = src.bn1.weight.detach().numpy()
        dst_p["BatchNorm_0"]["bias"] = src.bn1.bias.detach().numpy()
        dst_bs["BatchNorm_0"]["mean"] = src.bn1.running_mean.numpy()
        dst_bs["BatchNorm_0"]["var"] = src.bn1.running_var.numpy()
        dst_p["Conv_1"]["kernel"] = conv(src.conv2.weight)
        dst_p["Conv_1"]["bias"] = src.conv2.bias.detach().numpy()
        dst_p["BatchNorm_1"]["scale"] = src.bn2.weight.detach().numpy()
        dst_p["BatchNorm_1"]["bias"] = src.bn2.bias.detach().numpy()
        dst_bs["BatchNorm_1"]["mean"] = src.bn2.running_mean.numpy()
        dst_bs["BatchNorm_1"]["var"] = src.bn2.running_var.numpy()

    net = tnet
    for i, blk in enumerate([net.a1, net.a2, net.a3, net.bott]):
        set_convblock(p[f"ConvBlock3D_{i}"], bs[f"ConvBlock3D_{i}"], blk)

    ups = [("UpBlock3D_0", net.s3), ("UpBlock3D_1", net.s2),
           ("head_block", net.s1)]
    for name, blk in ups:
        p[name]["ConvTranspose_0"]["kernel"] = tconv(blk.up.weight)
        p[name]["ConvTranspose_0"]["bias"] = blk.up.bias.detach().numpy()
        set_convblock(p[name], bs[name], blk)
        if name == "head_block":
            p[name]["Conv_2"]["kernel"] = conv(blk.head.weight)
            p[name]["Conv_2"]["bias"] = blk.head.bias.detach().numpy()
    return {"params": p, "batch_stats": bs}


def _plain(tree):
    if hasattr(tree, "items"):
        return {k: _plain(v) for k, v in tree.items()}
    return tree


@pytest.mark.slow
def test_unet_forward_parity():
    torch.manual_seed(0)
    tnet = build_torch_unet().eval()

    model = UNet3D(in_channels=1, num_classes=1, level_channels=LEVELS,
                   bottleneck_channel=BOTTLENECK, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    variables = copy_weights(tnet, variables)

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    theirs = theirs.transpose(0, 2, 3, 4, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
