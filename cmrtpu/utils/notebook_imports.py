"""Common interactive-session imports + seeding — parity with
src/utils/Notebook_imports.py:1-29.

Usage in a notebook/REPL::

    from cmrtpu.utils.notebook_imports import *
"""

import logging
import os
import random
import sys

import numpy as np

try:
    import matplotlib
    import matplotlib.pyplot as plt
except ImportError:  # headless minimal env
    plt = None
try:
    import pandas as pd
except ImportError:
    pd = None

SEED = 42
random.seed(SEED)
np.random.seed(SEED)

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)

try:  # widget interactivity if available (notebooks only)
    from ipywidgets import interact, interact_manual  # noqa: F401
except ImportError:
    interact = interact_manual = None

__all__ = ["logging", "logger", "np", "os", "pd", "plt", "random", "sys",
           "SEED", "interact", "interact_manual"]
