"""Framework-wide logger (parity: reference thre3d_atom/utils/logging.py:1-4)."""
import logging

logging.basicConfig(format="%(asctime)s | %(message)s", level=logging.INFO)

log = logging
