#!/usr/bin/env python
"""Convert a BEVDet/BEVStereo torch checkpoint into a flax params overlay.

Usage:
  python tools/convert_torch_checkpoint.py CKPT.pth OUT.msgpack [--config CFG]

Ports the warm-start checkpoint the reference trains from
(`bevdet-stbase-4d-stereo-512x1408-cbgs.pth`, `bevstereo-occ.py:257`); heads
not present in the source keep their fresh init.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("out")
    p.add_argument("--report", action="store_true",
                   help="print per-module port coverage")
    args = p.parse_args()

    import torch

    from preworld_tpu.utils.torch_port import convert_full_model

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    state_np = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    params, stats = convert_full_model(state_np)

    with open(args.out, "wb") as fh:
        pickle.dump({"params": params, "batch_stats": stats}, fh)

    n = sum(1 for _ in _leaves(params))
    print(f"ported {n} tensors -> {args.out}")
    if args.report:
        used = set()
        for k in state_np:
            used.add(k.split(".")[0])
        print("torch top-level modules:", sorted(used))


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
