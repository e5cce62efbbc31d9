"""Deterministic CLIP-embedding stand-in for the torch-free registry golden
test (loaded on Spark WORKERS via AESTHETIC_EMBEDDER_ENV's file-path form,
so it must be importable standalone — no test-suite imports).

Maps each frame to one of the two pinned golden directions from
tests/test_model_adapters.py (rng(7) unit vector -> 5.240217, uniform
vector -> 4.883285 through the public LAION head), scaled by 3.0 ON PURPOSE:
the adapter contract says embedders return raw CLIP features and the adapter
itself applies the reference's normalized(), so the scale must not matter.
"""

import numpy as np


def embed(frames, h, w):
    golden = np.random.default_rng(7).standard_normal(768).astype(np.float32)
    golden /= np.linalg.norm(golden)
    uniform = np.full(768, 1.0 / np.sqrt(768), dtype=np.float32)
    out = []
    for f in frames:
        base = golden if int(np.asarray(f)[0, 0]) % 2 == 0 else uniform
        out.append(3.0 * base)
    return np.stack(out)
