"""Film output conventions (saveImage / Image parity)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_2025_tpu.utils import image_io


def test_film_to_u8_clamp_truncate_mirror():
    film = np.zeros((2, 3, 3), np.float32)
    film[0, 0] = [2.0, 0.5, -1.0]  # over / mid / under after /iters
    film[1, 2] = [1.0, 1.0, 1.0]
    u8 = image_io.film_to_u8(film, iterations=1, mirror=False)
    assert tuple(u8[0, 0]) == (255, 127, 0)  # truncating cast: 0.5*255=127.5 -> 127
    u8m = image_io.film_to_u8(film, iterations=1, mirror=True)
    np.testing.assert_array_equal(u8m[0, 2], u8[0, 0])  # horizontal mirror


def test_film_divides_by_iterations():
    film = np.full((1, 1, 3), 4.0, np.float32)
    u8 = image_io.film_to_u8(film, iterations=8, mirror=False)
    assert tuple(u8[0, 0]) == (127, 127, 127)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    image_io.write_png(p, img)
    back = image_io.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_save_film_naming(tmp_path):
    film = np.ones((4, 4, 3), np.float32)
    path = image_io.save_film(
        film, 7, "myscene", out_dir=str(tmp_path), timestamp="2026-01-01_00-00-00z"
    )
    assert path.endswith("myscene.2026-01-01_00-00-00z.7samp.png")
    import os

    assert os.path.exists(path)


def test_hdr_writer(tmp_path):
    film = np.zeros((2, 2, 3), np.float32)
    film[0, 0] = [1.0, 2.0, 4.0]
    film[1, 1] = [0.0, 0.0, 0.0]
    p = image_io.save_film(
        film, 1, "h", out_dir=str(tmp_path), hdr=True, mirror=False,
        timestamp="t",
    )
    assert p.endswith(".hdr")
    data = open(p, "rb").read()
    assert data.startswith(b"#?RADIANCE")
    assert b"-Y 2 +X 2" in data
    # decode the RGBE pixel back
    header_end = data.index(b"-Y 2 +X 2\n") + len(b"-Y 2 +X 2\n")
    px = np.frombuffer(data[header_end:], np.uint8).reshape(2, 2, 4)
    r, g, b, e = px[0, 0].astype(float)
    scale = 2.0 ** (e - 128) / 256.0
    np.testing.assert_allclose(
        [r * scale, g * scale, b * scale], [1.0, 2.0, 4.0], rtol=0.02
    )
    assert tuple(px[1, 1]) == (0, 0, 0, 0)
