"""Native (C++) components of the ocpg_tpu runtime.

`io` — libjpeg/libpng decode path for the data loader (compiled on first
import, PIL fallback when the toolchain is unavailable).
"""
