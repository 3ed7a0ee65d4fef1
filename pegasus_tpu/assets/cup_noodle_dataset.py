"""Import-compatible roster module (reference: src/dataset/cup_noodle_dataset.py)."""

from pegasus_tpu.assets.rosters import CUP_NOODLE_CLASSES as _C

globals().update(_C)
__all__ = list(_C)
