from .align_seq import (Sequence, align_sequences, fuse_sequences,
                        match_sequence_pair, AlignResult)
from .deform_render import deform_stage, render_stage
from .fixtures import make_scene, uv_sphere, ring_cameras, textured_views
from .ingest import load_sequences, load_sequence_dir, save_sequence_dir

__all__ = [
    "Sequence", "align_sequences", "fuse_sequences", "match_sequence_pair",
    "AlignResult", "deform_stage", "render_stage",
    "make_scene", "uv_sphere", "ring_cameras", "textured_views",
    "load_sequences", "load_sequence_dir", "save_sequence_dir",
]
