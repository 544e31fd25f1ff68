"""Extract the 256-pair oriented-BRIEF sampling pattern as packed data.

The table is the standard OpenCV ORB learned sampling pattern (public
constant data, shipped verbatim per SURVEY.md §2.1: "the 256x4 int table —
ship verbatim as data"; reference: src/ORBextractor.cc:150-408). This script
parses it out of the reference source once and stores it as an .npy asset so
no generated C-array code lives in the repo.

Usage: python scripts/extract_brief_pattern.py
Writes: orb_slam2_with_comment_tpu/frontend/data/brief_pattern.npy  [256, 4] int8
"""
import os
import re

import numpy as np

SRC = "/root/reference/src/ORBextractor.cc"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "orb_slam2_with_comment_tpu", "frontend", "data", "brief_pattern.npy",
)


def main():
    with open(SRC, "r", errors="replace") as f:
        text = f.read()
    m = re.search(r"bit_pattern_31_\[256\*4\]\s*=\s*\{(.*?)\};", text, re.S)
    assert m, "pattern table not found"
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    vals = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(vals) == 1024, f"expected 1024 ints, got {len(vals)}"
    pat = np.asarray(vals, np.int8).reshape(256, 4)
    assert pat.min() >= -13 and pat.max() <= 13
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.save(OUT, pat)
    print(f"wrote {OUT} shape={pat.shape} first={pat[0].tolist()}")


if __name__ == "__main__":
    main()
