"""grid_sample / resize_bilinear vs torch oracle (the reference's runtime
uses F.grid_sample / F.interpolate; torch-cpu serves as golden)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from isfusion_tpu.ops.interpolate import (  # noqa: E402
    bilinear_sample, grid_sample, resize_bilinear)


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch(align):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(7, 9, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(5, 4, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  align_corners=align))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros",
        align_corners=align)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(align):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 8, 4)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (12, 16),
                                      align_corners=align))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(12, 16),
        mode="bilinear", align_corners=align
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_sample_zero_outside():
    img = jnp.ones((4, 4, 2))
    x = jnp.asarray([-1.0, 5.0, 1.5])
    y = jnp.asarray([1.0, 1.0, 1.5])
    out = np.asarray(bilinear_sample(img, x, y))
    assert (out[0] == 0).all() and (out[1] == 0).all()
    np.testing.assert_allclose(out[2], 1.0)
