"""Texture sampling from the packed atlas — backend-generic.

Re-implements ``Texture::SampleBilinear`` / ``SampleNearest``
(Texture.cu:94-139) over the atlas layout (scene/types.py::TextureAtlas):
one (K, H, W, 3) gather source so per-ray texture ids never fan out into
separate arrays (SURVEY.md §7 hard-part #5).  UVs wrap (repeat addressing);
bilinear fetch is a lerp and therefore differentiable, matching the
custom-VJP note in SURVEY.md §7.
"""

from __future__ import annotations

from fypraytracer_tpu.core.mathutils import _xp
from fypraytracer_tpu.scene.types import TextureAtlas


def _level(atlas: TextureAtlas, bounce: bool):
    """Mip level per the TextureAtlas policy: primary fetches read mip 0,
    bounce-hit fetches read the prefiltered bounce level."""
    if bounce and atlas.bounce_pages is not None:
        return atlas.bounce_pages
    return atlas.pages


def sample_bilinear(atlas: TextureAtlas, tex_id, u, v, bounce: bool = False):
    """Bilinear sample; ``tex_id`` (B,) i32 (clamped to valid), ``u``/``v``
    (B,) in [0,1] (wrapped).  Returns (B, 3) RGB."""
    xp = _xp(u)
    pages = _level(atlas, bounce)
    k, h, w = pages.shape[0], pages.shape[1], pages.shape[2]
    tid = xp.clip(tex_id, 0, k - 1)

    fx = (u % 1.0) * (w - 1)
    fy = (v % 1.0) * (h - 1)
    x0 = xp.floor(fx).astype(xp.int32)
    y0 = xp.floor(fy).astype(xp.int32)
    x1 = xp.minimum(x0 + 1, w - 1)
    y1 = xp.minimum(y0 + 1, h - 1)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    c00 = pages[tid, y0, x0]
    c10 = pages[tid, y0, x1]
    c01 = pages[tid, y1, x0]
    c11 = pages[tid, y1, x1]
    top = c00 * (1.0 - ax) + c10 * ax
    bot = c01 * (1.0 - ax) + c11 * ax
    return top * (1.0 - ay) + bot * ay


def sample_nearest(atlas: TextureAtlas, tex_id, u, v):
    """Nearest-neighbor sample (Texture.cu:94-112)."""
    xp = _xp(u)
    pages = atlas.pages
    k, h, w = pages.shape[0], pages.shape[1], pages.shape[2]
    tid = xp.clip(tex_id, 0, k - 1)
    x = xp.clip(((u % 1.0) * w).astype(xp.int32), 0, w - 1)
    y = xp.clip(((v % 1.0) * h).astype(xp.int32), 0, h - 1)
    return pages[tid, y, x]
