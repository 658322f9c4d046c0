"""CLI + PGM IO tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from popsift_tpu.io.pgm import read_pgm, write_pgm, rgb_to_grey


def test_pgm_roundtrip(tmp_path):
    img = (np.arange(20 * 30) % 256).astype(np.uint8).reshape(20, 30)
    p = tmp_path / "t.pgm"
    write_pgm(str(p), img)
    back = read_pgm(str(p))
    np.testing.assert_array_equal(img, back)


def test_pgm_ascii(tmp_path):
    img = np.array([[0, 128], [255, 64]], np.uint8)
    p = tmp_path / "a.pgm"
    p.write_text("P2\n# comment\n2 2\n255\n0 128\n255 64\n")
    back = read_pgm(str(p))
    np.testing.assert_array_equal(img, back)


def test_ppm_grey_conversion(tmp_path):
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 200  # pure red
    p = tmp_path / "c.ppm"
    with open(p, "wb") as f:
        f.write(b"P6\n2 2\n255\n" + rgb.tobytes())
    back = read_pgm(str(p))
    expect = (4899 * 200) >> 14  # pgmread.cpp coefficients
    np.testing.assert_array_equal(back, expect)


def test_rgb_to_grey_white():
    rgb = np.full((1, 1, 3), 255, np.uint8)
    # (4899+9617+1868)*255 >> 14 = 255 (coefficients sum to 2^14)
    assert rgb_to_grey(rgb)[0, 0] == 255


@pytest.fixture(scope="module")
def demo_image(tmp_path_factory, request):
    tmp = tmp_path_factory.mktemp("cli")
    h, w = 64, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for (cx, cy, s) in [(25, 20, 3.0), (55, 40, 4.0)]:
        img += np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    arr = np.clip(img * 220, 0, 255).astype(np.uint8)
    p = tmp / "img.pgm"
    write_pgm(str(p), arr)
    return str(p)


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# each subprocess CLI run jit-compiles a full pipeline from scratch
slow = pytest.mark.slow


def _run_cli(module, args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               POPSIFT_TPU_PLATFORM="cpu")
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True, text=True, cwd=cwd, env=env, timeout=600)


@slow
def test_demo_cli(demo_image, tmp_path):
    r = _run_cli("popsift_tpu.cli.demo", ["-i", demo_image], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "Number of feature points:" in r.stderr
    out = tmp_path / "output-features.txt"
    assert out.exists()
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= 1
    assert len(lines[0].split()) == 133


@slow
def test_demo_cli_flags(demo_image, tmp_path):
    r = _run_cli("popsift_tpu.cli.demo",
                 ["-i", demo_image, "--gauss-mode", "vlfeat",
                  "--desc-mode", "loop", "--popsift-mode", "--root-sift",
                  "--downsampling", "-1", "--dont-write"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert not (tmp_path / "output-features.txt").exists()


@slow
def test_demo_cli_print_gauss_tables(demo_image, tmp_path):
    r = _run_cli("popsift_tpu.cli.demo",
                 ["-i", demo_image, "--print-gauss-tables", "--dont-write"],
                 str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "Gauss tables" in r.stdout


@slow
def test_match_cli(demo_image, tmp_path):
    r = _run_cli("popsift_tpu.cli.match",
                 ["-l", demo_image, "-r", demo_image], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "Number of features:" in r.stdout
    assert "accept" in r.stdout


@slow
def test_demo_cli_log_dump(demo_image, tmp_path):
    r = _run_cli("popsift_tpu.cli.demo",
                 ["-i", demo_image, "--log", "--dont-write"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    # reference layout (sift_octave.cu:119-137)
    for d in ("dir-octave", "dir-octave-dump", "dir-dog", "dir-dog-txt",
              "dir-dog-dump", "dir-desc", "dir-fpt"):
        assert (tmp_path / d).is_dir(), d
    pgms = list((tmp_path / "dir-octave").glob("*.pgm"))
    assert len(pgms) > 5
    dumps = list((tmp_path / "dir-dog-dump").glob("*.dump"))
    assert len(dumps) > 4
