"""MedicalNet torch->flax weight ingestion: numeric forward parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from multimodal_ad_tpu.models.resnet3d import ResNet3D
from multimodal_ad_tpu.utils.torch_weights import (load_medicalnet_weights,
                                                   load_torch_state_dict,
                                                   resnet3d_name_map)


def build_torch_resnet10():
    """Minimal torch twin of the MedicalNet ResNet-10 backbone with the
    reference's parameter naming (conv1/bn1, layerX.Y.convZ/bnZ,
    downsample.0/1) for generating test checkpoints."""

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1, dilation=1):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, cout, 3, stride, dilation, dilation,
                                    bias=False)
            self.bn1 = tnn.BatchNorm3d(cout)
            self.conv2 = tnn.Conv3d(cout, cout, 3, 1, dilation, dilation,
                                    bias=False)
            self.bn2 = tnn.BatchNorm3d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm3d(cout))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            o = torch.relu(self.bn1(self.conv1(x)))
            o = self.bn2(self.conv2(o))
            return torch.relu(o + r)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv3d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm3d(64)
            self.maxpool = tnn.MaxPool3d(3, 2, 1)
            self.layer1 = tnn.Sequential(Block(64, 64))
            self.layer2 = tnn.Sequential(Block(64, 128, stride=2))
            self.layer3 = tnn.Sequential(Block(128, 256, dilation=2))
            self.layer4 = tnn.Sequential(Block(256, 512, dilation=4))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = l(x)
            return x

    return Net()


class TestWeightIngestion:
    def test_name_map_covers_checkpoint(self):
        net = build_torch_resnet10()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        mapped = {row[0] for row in resnet3d_name_map(10, "B")}
        ckpt_keys = {k for k in sd if "num_batches_tracked" not in k}
        assert ckpt_keys == mapped & ckpt_keys
        assert not (mapped - ckpt_keys), mapped - ckpt_keys

    @pytest.mark.slow  # torch fwd + jax fwd, 20-65s on the throttly 1-CPU
    def test_forward_parity_after_load(self, tmp_path):  # box; name-map +
        # intersection tests keep the ingestion surface in the fast tier
        """Same random torch weights -> same eval-mode features (headless
        backbone), torch vs flax, rtol 1e-3."""
        torch.manual_seed(0)
        net = build_torch_resnet10().eval()
        ckpt = str(tmp_path / "medicalnet.pth")
        torch.save({"state_dict": {f"module.{k}": v for k, v in
                                   net.state_dict().items()}}, ckpt)

        model = ResNet3D(depth=10, head="none", dtype=jnp.float32)
        x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(x), train=False)

        sd = load_torch_state_dict(ckpt)
        new_vars, report = load_medicalnet_weights(variables, sd, depth=10)
        assert not report["mismatched"]
        assert len(report["loaded"]) >= 40

        ours = np.asarray(model.apply(
            {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
            jnp.asarray(x), train=False))
        with torch.no_grad():
            theirs = net(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        theirs = theirs.transpose(0, 2, 3, 4, 1)  # NCDHW -> NDHWC
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)

    def test_partial_intersection_semantics(self, tmp_path):
        """Keys missing from the checkpoint keep their init (reference
        train_ResNet3D.py:74-81 merge)."""
        torch.manual_seed(1)
        net = build_torch_resnet10()
        sd_full = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        sd_partial = {k: v for k, v in sd_full.items() if "layer4" not in k}

        model = ResNet3D(depth=10, head="none", dtype=jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 16, 16, 16, 1)), train=False)
        new_vars, report = load_medicalnet_weights(variables, sd_partial, 10)
        assert any("layer4" in s for s in report["skipped"])
        # layer4 params untouched
        old4 = variables["params"]["BasicBlock_3"]["ConvBN_0"]["Conv_0"]["kernel"]
        new4 = new_vars["params"]["BasicBlock_3"]["ConvBN_0"]["Conv_0"]["kernel"]
        np.testing.assert_array_equal(np.asarray(old4), new4)
        # stem loaded
        assert not np.allclose(
            np.asarray(variables["params"]["Conv_0"]["kernel"]),
            new_vars["params"]["Conv_0"]["kernel"])
