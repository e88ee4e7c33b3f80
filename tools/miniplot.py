"""Minimal dependency-free PNG chart renderer (stdlib + numpy only).

The reference renders six chart families with matplotlib/seaborn
(/root/reference/main.py:570-891); this container has no matplotlib, so
`charts.py` falls back to this module — a tiny rasterizer good enough to
draw labeled bar and line charts into real PNG files.  Presentation-only:
no engine logic lives here (SURVEY.md §2.1 scopes chart sinks out of the
engine; every chart's feeding DataFrame is an oracle-checked query).

PNG output: 8-bit RGB, one IDAT, zlib-compressed, filter 0 rows.
Text: a compact 5x7 bitmap font (uppercase + digits + punctuation);
non-renderable characters come out as '?', which is fine for a demo.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# 5x7 font: each glyph is 7 rows of 5 bits (MSB left).
_F = {
    "A": "0E 11 11 1F 11 11 11", "B": "1E 11 11 1E 11 11 1E",
    "C": "0E 11 10 10 10 11 0E", "D": "1E 11 11 11 11 11 1E",
    "E": "1F 10 10 1E 10 10 1F", "F": "1F 10 10 1E 10 10 10",
    "G": "0E 11 10 17 11 11 0F", "H": "11 11 11 1F 11 11 11",
    "I": "0E 04 04 04 04 04 0E", "J": "01 01 01 01 11 11 0E",
    "K": "11 12 14 18 14 12 11", "L": "10 10 10 10 10 10 1F",
    "M": "11 1B 15 15 11 11 11", "N": "11 19 15 13 11 11 11",
    "O": "0E 11 11 11 11 11 0E", "P": "1E 11 11 1E 10 10 10",
    "Q": "0E 11 11 11 15 12 0D", "R": "1E 11 11 1E 14 12 11",
    "S": "0F 10 10 0E 01 01 1E", "T": "1F 04 04 04 04 04 04",
    "U": "11 11 11 11 11 11 0E", "V": "11 11 11 11 11 0A 04",
    "W": "11 11 11 15 15 1B 11", "X": "11 0A 04 04 04 0A 11",
    "Y": "11 11 0A 04 04 04 04", "Z": "1F 01 02 04 08 10 1F",
    "0": "0E 11 13 15 19 11 0E", "1": "04 0C 04 04 04 04 0E",
    "2": "0E 11 01 06 08 10 1F", "3": "0E 11 01 06 01 11 0E",
    "4": "02 06 0A 12 1F 02 02", "5": "1F 10 1E 01 01 11 0E",
    "6": "06 08 10 1E 11 11 0E", "7": "1F 01 02 04 08 08 08",
    "8": "0E 11 11 0E 11 11 0E", "9": "0E 11 11 0F 01 02 0C",
    " ": "00 00 00 00 00 00 00", "-": "00 00 00 1F 00 00 00",
    "_": "00 00 00 00 00 00 1F", ".": "00 00 00 00 00 0C 0C",
    ",": "00 00 00 00 0C 04 08", ":": "00 0C 0C 00 0C 0C 00",
    "/": "01 01 02 04 08 10 10", "?": "0E 11 01 02 04 00 04",
    "(": "02 04 08 08 08 04 02", ")": "08 04 02 02 02 04 08",
    "'": "04 04 00 00 00 00 00", "@": "0E 11 17 15 17 10 0E",
    "%": "19 1A 02 04 08 0B 13", "+": "00 04 04 1F 04 04 00",
    "#": "0A 1F 0A 0A 0A 1F 0A",
}
_GLYPHS = {
    ch: np.array(
        [[(int(b, 16) >> (4 - c)) & 1 for c in range(5)] for b in rows.split()],
        dtype=np.uint8,
    )
    for ch, rows in _F.items()
}


def _write_png(path: str, img: np.ndarray) -> None:
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


class Canvas:
    def __init__(self, w: int, h: int, bg=(255, 255, 255)):
        self.img = np.full((h, w, 3), np.array(bg, dtype=np.uint8), dtype=np.uint8)
        self.w, self.h = w, h

    def rect(self, x0, y0, x1, y1, color):
        x0, x1 = max(0, min(x0, x1)), min(self.w, max(x0, x1))
        y0, y1 = max(0, min(y0, y1)), min(self.h, max(y0, y1))
        self.img[y0:y1, x0:x1] = color

    def hline(self, y, x0, x1, color):
        self.rect(x0, y, x1, y + 1, color)

    def vline(self, x, y0, y1, color):
        self.rect(x, y0, x + 1, y1, color)

    def line(self, x0, y0, x1, y1, color, thick=2):
        n = max(abs(x1 - x0), abs(y1 - y0), 1)
        xs = np.linspace(x0, x1, n * 2).astype(int)
        ys = np.linspace(y0, y1, n * 2).astype(int)
        t = thick // 2
        for x, y in zip(xs, ys):
            self.rect(x - t, y - t, x + t + 1, y + t + 1, color)

    def text(self, x, y, s, color=(30, 30, 30), scale=2):
        cx = x
        for ch in str(s).upper():
            g = _GLYPHS.get(ch, _GLYPHS["?"])
            gh, gw = g.shape
            mask = np.kron(g, np.ones((scale, scale), dtype=np.uint8)).astype(bool)
            y1, x1 = y + gh * scale, cx + gw * scale
            if 0 <= y and y1 <= self.h and 0 <= cx and x1 <= self.w:
                region = self.img[y:y1, cx:x1]
                region[mask] = color
            cx += (gw + 1) * scale

    def save(self, path: str) -> None:
        _write_png(path, self.img)


def _text_w(s: str, scale: int) -> int:
    return len(str(s)) * 6 * scale


PALETTE = [
    (68, 119, 170), (238, 119, 51), (34, 136, 51), (204, 51, 17),
    (170, 51, 119), (102, 204, 238), (187, 187, 85), (136, 34, 85),
]


def barh(path, labels, values, title, width=1280, height=None):
    """Horizontal bar chart (reference charts 2/3/4/6 shape)."""
    n = len(labels)
    height = height or max(360, 120 + n * 34)
    c = Canvas(width, height)
    c.text(24, 16, title, scale=3)
    left = 24 + max((_text_w(l, 2) for l in labels), default=0) + 12
    top, bottom, right = 70, height - 24, width - 120
    vmax = max([abs(v) for v in values], default=1) or 1
    for i, (lab, val) in enumerate(zip(labels, values)):
        y0 = top + i * ((bottom - top) // max(n, 1))
        bh = max(8, (bottom - top) // max(n, 1) - 10)
        w = int((right - left) * (val / vmax))
        c.text(24, y0 + bh // 2 - 7, lab, scale=2)
        c.rect(left, y0, left + max(w, 1), y0 + bh, PALETTE[i % len(PALETTE)])
        c.text(left + max(w, 1) + 8, y0 + bh // 2 - 7, f"{val:,}", scale=2)
    c.vline(left - 2, top - 6, bottom, (51, 51, 51))
    c.save(path)


def barv(path, labels, values, title, width=1280, height=720):
    """Vertical bar chart (reference chart 1 shape)."""
    n = max(len(labels), 1)
    c = Canvas(width, height)
    c.text(24, 16, title, scale=3)
    top, bottom, left, right = 80, height - 70, 80, width - 24
    vmax = max([abs(v) for v in values], default=1) or 1
    slot = (right - left) // n
    for i, (lab, val) in enumerate(zip(labels, values)):
        x0 = left + i * slot + slot // 8
        bw = max(8, slot * 3 // 4)
        h = int((bottom - top) * (val / vmax))
        c.rect(x0, bottom - max(h, 1), x0 + bw, bottom, PALETTE[i % len(PALETTE)])
        c.text(x0 + max(0, (bw - _text_w(f"{val:,}", 2)) // 2), bottom - h - 22, f"{val:,}", scale=2)
        c.text(x0, bottom + 10, str(lab)[: max(1, bw // 12)], scale=2)
    c.hline(bottom, left - 6, right, (51, 51, 51))
    c.save(path)


def wordcloud(path, freqs, title, width=1280, height=720):
    """Frequency-scaled word cloud (reference chart 4B shape,
    main.py:767-790 — `WordCloud.generate_from_frequencies`).

    Deterministic stand-in for the wordcloud package: words sorted by
    count descending, glyph scale proportional to sqrt(count/max), each
    placed on an archimedean spiral from the canvas center at the first
    collision-free spot (same greedy strategy wordcloud itself uses,
    minus its random orientation/jitter — determinism beats fidelity in
    a demo layer that must render identically across runs).
    """
    c = Canvas(width, height)
    c.text(24, 16, title, scale=3)
    items = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    if not items:
        c.save(path)
        return
    cmax = items[0][1] or 1
    cx0, cy0 = width // 2, (height + 60) // 2
    placed: list[tuple[int, int, int, int]] = []

    def collides(x0, y0, x1, y1):
        if x0 < 8 or y0 < 60 or x1 > width - 8 or y1 > height - 8:
            return True
        return any(
            x0 < px1 + 4 and x1 + 4 > px0 and y0 < py1 + 4 and y1 + 4 > py0
            for px0, py0, px1, py1 in placed
        )

    for i, (word, cnt) in enumerate(items):
        scale = max(1, min(7, round(1 + 6 * (cnt / cmax) ** 0.5)))
        tw, th = _text_w(word, scale), 7 * scale
        spot = None
        # spiral: radius grows ~2px per step, angle from a per-word
        # golden-ratio offset so successive words fan out evenly
        for step in range(2400):
            ang = 2.399963 * (i + step * 0.05)
            r = 2.0 * step * 0.05
            x0 = int(cx0 + r * np.cos(ang)) - tw // 2
            y0 = int(cy0 + r * np.sin(ang) * 0.6) - th // 2
            if not collides(x0, y0, x0 + tw, y0 + th):
                spot = (x0, y0)
                break
        if spot is None:
            continue  # canvas full; drop the rarest words
        x0, y0 = spot
        placed.append((x0, y0, x0 + tw, y0 + th))
        c.text(x0, y0, word, color=PALETTE[i % len(PALETTE)], scale=scale)
    c.save(path)


def lines(path, series, title, width=1280, height=720):
    """Multi-series line chart (reference chart 5 shape).

    ``series`` = {name: [(x_ordinal, y), ...]} — x ordinals need not align.
    """
    c = Canvas(width, height)
    c.text(24, 16, title, scale=3)
    top, bottom, left, right = 80, height - 50, 80, width - 24
    pts = [p for s in series.values() for p in s]
    if not pts:
        c.save(path)
        return
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    x0v, x1v = min(xs), max(xs) or 1
    y1v = max(ys) or 1
    spanx = (x1v - x0v) or 1
    for si, (name, s) in enumerate(sorted(series.items())):
        color = PALETTE[si % len(PALETTE)]
        prev = None
        for x, y in sorted(s):
            px = left + int((right - left) * (x - x0v) / spanx)
            py = bottom - int((bottom - top) * (y / y1v))
            if prev:
                c.line(prev[0], prev[1], px, py, color)
            c.rect(px - 3, py - 3, px + 4, py + 4, color)
            prev = (px, py)
        c.text(right - 260, top + si * 22, name, color=color, scale=2)
    c.hline(bottom, left - 6, right, (51, 51, 51))
    c.vline(left - 6, top, bottom, (51, 51, 51))
    c.save(path)
