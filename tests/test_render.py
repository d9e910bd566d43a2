"""Render layer tests: view modes, masked normalization, colormaps,
terminal renderers."""

import jax
import numpy as np

from fluidsims_tpu.render.colormap import jet, mhd_cmap, to_rgba
from fluidsims_tpu.render.terminal import (autocontrast, hash_dither,
                                           render_halfblocks, render_ramp)
from fluidsims_tpu.render.views import VIEW_MODES, render_rgba, render_value
from fluidsims_tpu.solvers import hypersonic2d as h2


def small_state():
    cfg = h2.default_config(nx=64, ny=32)
    s = h2.init(cfg)
    s = jax.jit(lambda st: h2.run(cfg, st, 10))(s)
    return cfg, s


def test_all_view_modes_finite():
    cfg, s = small_state()
    for mode in VIEW_MODES:
        v = np.asarray(render_value(cfg, s, mode))
        assert np.isfinite(v).all(), mode
        assert (v[np.asarray(s.mask)] == 0).all(), mode


def test_render_rgba_solid_gray():
    cfg, s = small_state()
    img = render_rgba(cfg, s, "schlieren")
    assert img.shape == (32, 64, 4)
    solid = np.asarray(s.mask)
    assert (img[solid] == np.array([110, 110, 110, 255])).all()
    # fluid cells span the colormap (not all one color)
    assert len(np.unique(img[~solid][:, 0])) > 3


def test_jet_endpoints():
    rgb = jet(np.array([0.0, 0.5, 1.0]))
    assert tuple(rgb[0]) == (0, 0, 255)      # blue at 0
    assert rgb[1][1] == 255                  # green at mid
    assert tuple(rgb[2])[:2] == (255, 0)     # red at 1 (g=0 -> 2-4*0.5)
    assert to_rgba(rgb).shape == (3, 4)


def test_mhd_cmap_range():
    rgb = mhd_cmap(np.linspace(0, 1, 16))
    assert rgb.min() >= 0 and rgb.max() <= 255


def test_terminal_renderers():
    f = np.linspace(0, 1, 64).reshape(8, 8)
    s = render_ramp(f)
    assert len(s.splitlines()) == 8
    hb = render_halfblocks(f)
    assert len(hb.splitlines()) == 4
    ac = autocontrast(f)
    assert np.isfinite(ac).all()
    d = hash_dither(8, 8, 8)
    assert abs(d).max() <= 0.5 / 8 + 1e-9


def test_render_palette256():
    """The 256-color dynamic palette (init_colors_dynamic/band_to_pair,
    js_cuda3d.cu:471-517): band 0 is unstyled, nonzero bands map linearly
    onto xterm-256 indices 16..231 with ramp characters."""
    from fluidsims_tpu.render.terminal import render_palette256

    bands = np.array([[0, 1, 64, 128, 256]])
    out = render_palette256(bands)
    assert out.startswith("\x1b[0m ")       # band 0: unstyled space
    assert "\x1b[38;5;16m" in out           # band 1 -> first palette slot
    assert "\x1b[38;5;231m" in out          # top band -> last slot (231)
    assert "█" in out and "░" in out        # ramp characters scale
    # band 128 sits near the middle of 16..231
    import re

    idxs = [int(m) for m in re.findall(r"\x1b\[38;5;(\d+)m", out)]
    assert all(16 <= i <= 231 for i in idxs)


def test_cli_colors_256(capsys):
    from fluidsims_tpu.cli import main

    main(["stam3d", "--n", "16", "--steps", "2", "--render",
          "--colors", "256", "--cols", "30", "--rows", "12"])
    out = capsys.readouterr().out
    assert "\x1b[38;5;" in out


def test_png_writer(tmp_path):
    import struct
    import zlib

    from fluidsims_tpu.io.png import write_png

    rgb = np.zeros((5, 7, 3), np.uint8)
    rgb[2, 3] = (255, 128, 0)
    p = tmp_path / "t.png"
    write_png(p, rgb)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (7, 5)
    # decode the IDAT scanlines back and compare
    idat = data[data.index(b"IDAT") + 4:data.index(b"IEND") - 4]
    raw = zlib.decompress(idat)
    arr = np.frombuffer(raw, np.uint8).reshape(5, 1 + 7 * 3)
    assert (arr[:, 0] == 0).all()  # filter byte
    np.testing.assert_array_equal(arr[:, 1:].reshape(5, 7, 3), rgb)


def test_cli_png_export(tmp_path, capsys):
    from fluidsims_tpu.cli import main

    final = tmp_path / "gs.png"
    main(["gray-scott", "--nx", "32", "--ny", "16", "--steps", "4",
          "--headless", "--png", str(final)])
    assert final.exists()

    seq = tmp_path / "seq.png"
    main(["gray-scott", "--nx", "32", "--ny", "16", "--steps", "4",
          "--stride", "2", "--png", str(seq)])
    capsys.readouterr()
    assert (tmp_path / "seq_0000.png").exists()
    assert (tmp_path / "seq_0001.png").exists()
