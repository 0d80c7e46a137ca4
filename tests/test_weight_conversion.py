"""torch SuperPoint → npz → Flax must be numerically equivalent."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")


class TorchSuperPoint(torch.nn.Module):
    """Minimal torch twin of the standard SuperPointNet forward (encoder +
    heads), used only to validate the weight conversion path."""

    def __init__(self):
        super().__init__()
        c = torch.nn.Conv2d
        self.conv1a, self.conv1b = c(1, 64, 3, padding=1), c(64, 64, 3, padding=1)
        self.conv2a, self.conv2b = c(64, 64, 3, padding=1), c(64, 64, 3, padding=1)
        self.conv3a, self.conv3b = c(64, 128, 3, padding=1), c(128, 128, 3, padding=1)
        self.conv4a, self.conv4b = c(128, 128, 3, padding=1), c(128, 128, 3, padding=1)
        self.convPa, self.convPb = c(128, 256, 3, padding=1), c(256, 65, 1)
        self.convDa, self.convDb = c(128, 256, 3, padding=1), c(256, 256, 1)

    def forward(self, x):
        relu = torch.nn.functional.relu
        pool = torch.nn.functional.max_pool2d
        x = relu(self.conv1a(x)); x = relu(self.conv1b(x)); x = pool(x, 2)
        x = relu(self.conv2a(x)); x = relu(self.conv2b(x)); x = pool(x, 2)
        x = relu(self.conv3a(x)); x = relu(self.conv3b(x)); x = pool(x, 2)
        x = relu(self.conv4a(x)); x = relu(self.conv4b(x))
        semi = self.convPb(relu(self.convPa(x)))
        desc = self.convDb(relu(self.convDa(x)))
        desc = desc / desc.norm(dim=1, keepdim=True).clamp(min=1e-8)
        semi = torch.softmax(semi, 1)[:, :64]
        B, _, Hc, Wc = semi.shape
        heat = semi.permute(0, 2, 3, 1).reshape(B, Hc, Wc, 8, 8)
        heat = heat.permute(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
        return heat, desc.permute(0, 2, 3, 1)


def test_torch_to_flax_equivalence(tmp_path, rng):
    import jax.numpy as jnp

    from convert_superpoint import convert
    from omniswarm_tpu.models.superpoint import SuperPoint, load_params_npz

    net = TorchSuperPoint().eval()
    pth = tmp_path / "sp.pth"
    torch.save(net.state_dict(), pth)
    out = tmp_path / "sp.npz"
    convert(str(pth), str(out))

    params = load_params_npz(str(out))
    model = SuperPoint()
    img = rng.uniform(size=(1, 32, 48, 1)).astype(np.float32)
    heat_j, desc_j = model.apply(params["net"], jnp.asarray(img))

    with torch.no_grad():
        heat_t, desc_t = net(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(heat_j), heat_t.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(desc_j), desc_t.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_pca_csv_loading(tmp_path):
    from convert_superpoint import convert

    net = TorchSuperPoint()
    pth = tmp_path / "sp.pth"
    torch.save(net.state_dict(), pth)
    comps = np.random.default_rng(0).normal(size=(64, 256)).astype(np.float32)
    mean = np.random.default_rng(1).normal(size=256).astype(np.float32)
    cpath, mpath = tmp_path / "c.csv", tmp_path / "m.csv"
    np.savetxt(cpath, comps, delimiter=",")
    np.savetxt(mpath, mean[None], delimiter=",")
    out = tmp_path / "sp.npz"
    convert(str(pth), str(out), str(cpath), str(mpath))
    raw = np.load(out)
    np.testing.assert_allclose(raw["pca_components"], comps, atol=1e-6)
    np.testing.assert_allclose(raw["pca_mean"], mean, atol=1e-6)
