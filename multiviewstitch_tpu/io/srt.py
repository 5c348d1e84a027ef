"""Result/SRT.txt pose-chain checkpoint format.

The reference writes per-sequence (scale, R, t) blocks after alignment
(Processor.cpp:855-871: scale line, 3 rotation rows, translation row) and
the Render mode re-reads them (Processor.cpp:1145-1165) — the file is the
checkpoint boundary between the two pipeline halves (SURVEY §5.4). Same
format here so artifacts interoperate with the reference.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..core.transforms import Similarity


def save_srt(path: str, transforms: List[Similarity]):
    with open(path, "w") as f:
        for T in transforms:
            R = np.asarray(T.R, np.float64)
            t = np.asarray(T.t, np.float64)
            f.write(f"{float(np.asarray(T.s))}\n")
            for r in range(3):
                f.write(f"{R[r,0]} {R[r,1]} {R[r,2]}\n")
            f.write(f"{t[0]} {t[1]} {t[2]}\n")


def load_srt(path: str) -> List[Similarity]:
    vals = []
    with open(path) as f:
        for tok in f.read().split():
            vals.append(float(tok))
    out = []
    i = 0
    while i + 13 <= len(vals):
        s = vals[i]
        R = np.asarray(vals[i + 1:i + 10], np.float32).reshape(3, 3)
        t = np.asarray(vals[i + 10:i + 13], np.float32)
        out.append(Similarity(jnp.asarray(s, jnp.float32),
                              jnp.asarray(R), jnp.asarray(t)))
        i += 13
    return out
