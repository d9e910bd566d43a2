"""Terminal point-cloud renderer for the graph layouts.

Behavioral spec: number_fluid2d.c — the 16-color palette (kPalette16
:163-180), the five color schemes (point_color :692-724: mint, index
bands, log buckets, radius bands, xy xor), auto-fit camera
(camera_fit :668-689: center the bbox, zoom 0.88*fit), later-drawn
points overwriting earlier ones (draw_points_fast_xy :727-767), and the
orange root marker.  The raylib pixel loop becomes a half-block ANSI
truecolor raster: each character cell holds two vertically stacked
subpixels (fg = top, bg = bottom).
"""

from __future__ import annotations

import numpy as np

__all__ = ["PALETTE16", "SCHEMES", "color_index", "render_points"]

# kPalette16 (number_fluid2d.c:163-180), alpha dropped
PALETTE16 = np.array([
    (123, 236, 178), (102, 216, 238), (167, 139, 250), (244, 114, 182),
    (248, 113, 113), (251, 146, 60), (250, 204, 21), (163, 230, 53),
    (74, 222, 128), (45, 212, 191), (34, 211, 238), (96, 165, 250),
    (129, 140, 248), (192, 132, 252), (244, 114, 182), (251, 191, 36),
], np.uint8)

_MINT = np.array((123, 236, 178), np.uint8)
_ROOT = np.array((236, 178, 123), np.uint8)

SCHEMES = ("mint", "index", "log", "radius", "xor")


def color_index(i, x, y, scheme: str):
    """Per-body palette index (point_color, number_fluid2d.c:692-724);
    'mint' returns -1 (fixed color)."""
    i = np.asarray(i)
    if scheme == "mint":
        return np.full(i.shape, -1, np.int32)
    if scheme == "index":
        return (i & 15).astype(np.int32)
    if scheme == "log":
        return (np.floor(np.log2(np.maximum(i + 1, 1))).astype(np.int32)
                & 15)
    if scheme == "radius":
        d2 = x * x + y * y
        return ((d2 * 0.00006).astype(np.uint32) & 15).astype(np.int32)
    if scheme == "xor":
        ax = np.abs(x * 0.035).astype(np.int32).astype(np.uint32)
        ay = np.abs(y * 0.035).astype(np.int32).astype(np.uint32)
        return ((ax ^ ay) & 15).astype(np.int32)
    raise ValueError(f"unknown color scheme {scheme!r}; one of {SCHEMES}")


def render_points(pos, W: int, H: int, scheme: str = "mint",
                  color: bool = True) -> str:
    """Rasterize a (n, 2+) point cloud to a W x H character frame with 2x
    vertical subpixel resolution.  Body 0 (the root) gets the reference's
    orange marker; among overlapping bodies the highest index wins (the
    reference draws in index order, later pixels overwriting)."""
    pos = np.asarray(pos)[:, :2]
    n = pos.shape[0]
    x, y = pos[:, 0].astype(np.float64), pos[:, 1].astype(np.float64)

    # camera_fit: bbox center, zoom 0.88 * fit (number_fluid2d.c:668-689)
    lo = pos.min(0)
    hi = pos.max(0)
    bw = max(hi[0] - lo[0], 1e-6)
    bh = max(hi[1] - lo[1], 1e-6)
    SH = 2 * H
    zoom = 0.88 * min(W / bw, SH / bh)
    tx, ty = 0.5 * (lo[0] + hi[0]), 0.5 * (lo[1] + hi[1])

    sx = ((x - tx) * zoom + W * 0.5).astype(np.int64)
    sy = ((y - ty) * zoom + SH * 0.5).astype(np.int64)
    ok = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < SH)

    winner = np.full(SH * W, -1, np.int64)
    flat = (sy * W + sx)[ok]
    np.maximum.at(winner, flat, np.arange(n)[ok])

    idx = winner.reshape(SH, W)
    occupied = idx >= 0
    wi = np.maximum(idx, 0)
    ci = color_index(wi, x[wi], y[wi], scheme)
    rgb = np.where(
        (ci < 0)[..., None], _MINT[None, None, :], PALETTE16[ci & 15])
    rgb = np.where((idx == 0)[..., None], _ROOT[None, None, :], rgb)

    if not color:
        chars = np.where(occupied[0::2] & occupied[1::2], "█",
                         np.where(occupied[0::2], "▀",
                                  np.where(occupied[1::2], "▄", " ")))
        return "\n".join("".join(r) for r in chars[::-1])

    lines = []
    for row in range(H - 1, -1, -1):  # y up -> screen down
        top = 2 * row + 1
        bot = 2 * row
        parts = []
        for cx in range(W):
            t_on, b_on = occupied[top, cx], occupied[bot, cx]
            if not t_on and not b_on:
                parts.append("\x1b[0m ")
                continue
            tr, tg, tb = rgb[top, cx]
            br, bg_, bb = rgb[bot, cx]
            if t_on and b_on:
                parts.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                             f"\x1b[48;2;{br};{bg_};{bb}m▀")
            elif t_on:
                parts.append(f"\x1b[0m\x1b[38;2;{tr};{tg};{tb}m▀")
            else:
                parts.append(f"\x1b[0m\x1b[38;2;{br};{bg_};{bb}m▄")
        lines.append("".join(parts) + "\x1b[0m")
    return "\n".join(lines)
