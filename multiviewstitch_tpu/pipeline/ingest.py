"""Real-data ingestion: the reference's on-disk sequence layout -> Sequences.

Layout per image dir (from the reference's loaders):
  <dir>/*.act                calibration (LoadCameras, Processor.cpp:20-27
                             via ScanNSortDirectory *.act)
  <dir>/DATA/_depth<i>.raw   float32 disparity rasters (Processor.cpp:37)
  <dir>/<%05d>.jpg           RGB frames (Image3D.cpp:21)
Image dirs come from the config's imgPathList (ParamParser.cpp:93-106).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import StitchConfig
from ..core.cameras import load_act, CameraBatch
from ..io.native_loader import load_raw_batch
from .align_seq import Sequence


def _load_gray_image(path: str, width: int, height: int) -> np.ndarray:
    """Load an image as grayscale float (0..255), resized if needed —
    the reference's cv::imread + RGB2GRAY path (Common/Utils.h:221-262)."""
    from PIL import Image
    img = Image.open(path).convert("L")
    if img.size != (width, height):
        img = img.resize((width, height))
    return np.asarray(img, np.float32)


def load_sequence_dir(imgdir: str, cfg: StitchConfig,
                      use_check: bool = False) -> Optional[Sequence]:
    """Load one sequence directory. use_check reads DATA/CHECK depths (the
    consistency-filtered set the reference swaps in, Processor.cpp:919-931)."""
    acts = sorted(glob.glob(os.path.join(imgdir, "*.act")))
    if not acts:
        raise FileNotFoundError(f"no .act calibration in {imgdir}")
    cams = load_act(acts[0])
    n = len(cams)
    w, h = cams.width, cams.height

    sub = os.path.join("DATA", "CHECK") if use_check else "DATA"
    raw_paths = [os.path.join(imgdir, sub, f"_depth{i}.raw")
                 for i in range(n)]
    missing = [p for p in raw_paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(f"missing depth rasters, e.g. {missing[0]}")
    disp = load_raw_batch(raw_paths, w, h)

    grays = []
    for i in range(n):
        candidates = [os.path.join(imgdir, f"{i:05d}.jpg"),
                      os.path.join(imgdir, f"{i:05d}.png"),
                      os.path.join(imgdir, f"{i}.jpg")]
        path = next((c for c in candidates if os.path.exists(c)), None)
        if path is None:
            # depth-only sequences are allowed: use normalized disparity as
            # the photometric channel (features still found on depth edges)
            g = disp[i] / max(float(disp[i].max()), 1e-9) * 255.0
        else:
            g = _load_gray_image(path, w, h)
        grays.append(g)

    return Sequence(jnp.asarray(np.stack(grays)), jnp.asarray(disp), cams)


def load_sequences(cfg: StitchConfig, base_dir: str = ".",
                   use_check: bool = False,
                   prefetch_depth: int = 2) -> List[Sequence]:
    """Load all sequences listed in the config's image-dir list.

    Per-directory ingest (raw decode + image decode + device upload) is
    pipelined with ``prefetch_map`` so directory i+1 loads while directory
    i uploads — the host-side stage overlap the reference's serial main
    thread never had (pipeline/executor.py)."""
    from .executor import prefetch_map
    dirs = [d if os.path.isabs(d) else os.path.join(base_dir, d)
            for d in cfg.image_dirs]
    return list(prefetch_map(
        lambda full: load_sequence_dir(full, cfg, use_check), dirs,
        depth=prefetch_depth))


def save_sequence_dir(imgdir: str, seq: Sequence, start: int = 0):
    """Write a Sequence back in the reference layout (fixture export for
    interop tests and demos)."""
    from ..core.cameras import save_act
    from ..io.rawdepth import save_depth_raw
    from PIL import Image

    os.makedirs(os.path.join(imgdir, "DATA"), exist_ok=True)
    save_act(os.path.join(imgdir, "cameras.act"), seq.cams, start=start)
    disp = np.asarray(seq.disparity)
    gray = np.asarray(seq.gray)
    for i in range(disp.shape[0]):
        save_depth_raw(os.path.join(imgdir, "DATA", f"_depth{i}.raw"),
                       disp[i])
        img = np.clip(gray[i], 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(imgdir, f"{i:05d}.jpg"),
                                  quality=95)
