#!/usr/bin/env python
"""Fit the log-loss parameters used by the HDR losses (the reference ships
the magic numbers [0.2935, 0.7607] fitted in insert/tt.py and uses them in
losses.py:52 and insert_models.py:375).

The target: find (a, b) such that b*log((a+x)/(a+y)) approximates a
perceptual HDR difference curve — here, matching the slope of mu-law
tonemapping log(1+5000x)/log(5001) over x in [0, 1]."""

import numpy as np
from scipy.optimize import curve_fit


def mu_law(x, mu=5000.0):
    return np.log(1 + mu * x) / np.log(1 + mu)


def fit(n=2048):
    x = np.linspace(0, 1, n)

    def model(x, a, b, c):
        return b * np.log(a + x) + c

    popt, _ = curve_fit(model, x, mu_law(x), p0=[0.3, 0.7, 1.0],
                        maxfev=20000)
    return popt


if __name__ == "__main__":
    a, b, c = fit()
    print(f"log-loss params: a={a:.4f} b={b:.4f} (offset c={c:.4f})")
    print("reference ships a=0.2935 b=0.7607 (losses.py:52)")
