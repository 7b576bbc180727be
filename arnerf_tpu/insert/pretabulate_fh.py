#!/usr/bin/env python
"""Regenerate the SG hemisphere-integral table F(lambda, theta_d)
(reference insert/pretabulate_fh.py runs hours of scipy dblquad; this
vectorized quadrature takes seconds — see sg_shadow.compute_fh_table)."""

import numpy as np

from .sg_shadow import compute_fh_table, _FH_CACHE

if __name__ == "__main__":
    import os
    tab = compute_fh_table()
    os.makedirs(os.path.dirname(_FH_CACHE), exist_ok=True)
    np.save(_FH_CACHE, tab)
    print(f"saved {tab.shape} table -> {_FH_CACHE}")
