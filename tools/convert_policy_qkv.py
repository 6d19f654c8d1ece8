#!/usr/bin/env python
"""Convert pre-fused-QKV policy snapshots to the fused layout, losslessly.

Round 2 fused self-attention's three input projections into one [F, 3F]
matmul (models/transformer.py: qkv, split order q,k,v).  Round-1 policy
msgpacks still carry separate query/key/value projections; concatenating
their kernels/biases along the output axis reproduces the exact same
function under the fused layer.

Usage: python tools/convert_policy_qkv.py <old.msgpack> <out.msgpack>
       python tools/convert_policy_qkv.py --git <rev:path> <out.msgpack>
"""

import subprocess
import sys

import numpy as np
from flax import serialization


def convert(tree):
    if not isinstance(tree, dict):
        return tree
    keys = set(tree)
    if {"query", "key", "value"} <= keys and "qkv" not in keys:
        out = {k: v for k, v in tree.items()
               if k not in ("query", "key", "value")}
        out["qkv"] = {
            "kernel": np.concatenate(
                [tree["query"]["kernel"], tree["key"]["kernel"],
                 tree["value"]["kernel"]], axis=-1
            ),
            "bias": np.concatenate(
                [tree["query"]["bias"], tree["key"]["bias"],
                 tree["value"]["bias"]], axis=-1
            ),
        }
        return {k: convert(v) for k, v in out.items()}
    return {k: convert(v) for k, v in tree.items()}


def main():
    if sys.argv[1] == "--git":
        rev_path, out_path = sys.argv[2], sys.argv[3]
        rev, path = rev_path.split(":", 1)
        blob = subprocess.run(
            ["git", "show", f"{rev}:{path}"], capture_output=True,
            check=True,
        ).stdout
    else:
        in_path, out_path = sys.argv[1], sys.argv[2]
        blob = open(in_path, "rb").read()
    tree = serialization.msgpack_restore(blob)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(convert(tree)))
    print(f"converted -> {out_path}")


if __name__ == "__main__":
    main()
