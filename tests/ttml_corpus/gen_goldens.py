"""Generate golden expectations for the TTML conformance corpus.

For every corpus document this records:
  - the PARSE timeline through ``ttmlparse`` (pts, duration, markup text)
  - RENDER stats through ``ttmlrender`` (device atlas path, 320x240):
    per interval pts/duration, the count of non-transparent pixels, their
    bounding box, and per-channel pixel sums — a compact, regression-
    sensitive fingerprint of the raster without storing frames.

Goldens are environment-stable here because the image pins DejaVu fonts
and renders run on the deterministic CPU backend. Regenerate ONLY when a
behavior change is intentional, then review the diff:

    python tests/ttml_corpus/gen_goldens.py
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import numpy as np  # noqa: E402

from flutpu.core import Buffer, Harness  # noqa: E402

AREAS = ("Animation", "Content", "Metadata", "Parameters", "Styling",
         "Timing", "EbuTtD")
RENDER_W, RENDER_H = 320, 240


def parse_timeline(doc: str):
    h = Harness("ttmlparse")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(doc.encode(), pts=0))
    h.push_eos()
    out = []
    while True:
        b = h.try_pull(timeout=0.5)
        if b is None:
            break
        out.append({"pts": b.pts, "dur": b.duration,
                    "text": bytes(b.data).decode()})
    h.teardown()
    return out


def render_stats(doc: str):
    h = Harness(f"ttmlrender window-width={RENDER_W} "
                f"window-height={RENDER_H}")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(doc.encode(), pts=0))
    h.push_eos()
    out = []
    while True:
        b = h.try_pull(timeout=0.5)
        if b is None:
            break
        img = np.asarray(b.data)
        nz = img[..., 3] > 0
        if nz.any():
            ys, xs = np.nonzero(nz)
            bbox = [int(ys.min()), int(xs.min()),
                    int(ys.max()), int(xs.max())]
        else:
            bbox = []
        out.append({"pts": b.pts, "dur": b.duration,
                    "nonzero": int(nz.sum()), "bbox": bbox,
                    "sums": [int(img[..., c].astype(np.int64).sum())
                             for c in range(4)]})
    h.teardown()
    return out


def main():
    goldens = {}
    for area in AREAS:
        d = os.path.join(HERE, area)
        for name in sorted(os.listdir(d)):
            if not name.endswith(".xml"):
                continue
            key = f"{area}/{name[:-4]}"
            doc = open(os.path.join(d, name)).read()
            goldens[key] = {"parse": parse_timeline(doc),
                            "render": render_stats(doc)}
            print(key, len(goldens[key]["parse"]), "cues,",
                  len(goldens[key]["render"]), "frames")
    with open(os.path.join(HERE, "goldens.json"), "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(f"wrote goldens for {len(goldens)} documents")


if __name__ == "__main__":
    main()
