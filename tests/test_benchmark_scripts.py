"""Every benchmarking/*.sh flag set must round-trip through opt.py.

Guards the real-data day-one experience (VERDICT r2 next #8): the seven
benchmark scripts are the first thing a reference user runs, and a flag
that argparse rejects (or silently doesn't exist) would only surface on a
machine with the datasets. Flags are extracted from the actual `python
train.py \\` invocations in each script, shell variables replaced with
placeholders, and parsed with the real parser (which exits on unknowns).
"""

import glob
import os
import re

import pytest

from arnerf_tpu.opt import get_opts
from arnerf_tpu.datasets import dataset_dict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(ROOT, "benchmarking", "*.sh")))


def extract_invocations(path):
    """Return a list of argv lists, one per `python train.py` call."""
    text = open(path).read()
    # join backslash-continued lines
    text = re.sub(r"\\\s*\n", " ", text)
    calls = []
    for line in text.splitlines():
        line = line.strip()
        if "train.py" not in line:
            continue
        toks = line.split()
        toks = toks[toks.index("train.py") + 1:]
        argv = []
        for t in toks:
            if t == "$EXTRA_ARGS":
                # the optional args passthrough expands to nothing by
                # default — drop (other $VARs are flag VALUES -> dummy)
                continue
            # embedded shell variables (paths/scene names/scales) -> dummy
            argv.append("1" if "$" in t else t)
        calls.append(argv)
    return calls


def test_scripts_found():
    assert len(SCRIPTS) == 7, SCRIPTS


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.basename(s) for s in SCRIPTS])
def test_benchmark_script_flags_parse(script):
    calls = extract_invocations(script)
    assert calls, f"no train.py invocation found in {script}"
    for argv in calls:
        # argparse calls sys.exit(2) on unknown/malformed flags
        hp = get_opts(argv)
        assert hp.dataset_name in dataset_dict, hp.dataset_name
        assert hp.batch_size > 0 and hp.num_epochs > 0 and hp.lr > 0
