#!/usr/bin/env python
"""Generate a synthetic dummy dataset tree for the -demo path and CI.

Equivalent role to the reference's downloadable dummy data
(dataset/README.md): lets every CLI (two-stage training, demo fitting,
evaluation) run end-to-end without the license-gated NPHM dataset.

    python scripts/dataset/make_dummy_data.py --root ~/nphm_dummy
Then export the env vars it prints (or `eval $(... --print-env)`).
"""

import argparse

import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

from nphm_tpu.data.dummy import dummy_env, generate_dummy_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True, type=str)
    parser.add_argument(
        "--subjects", type=int, nargs="+", default=[351, 365, 199]
    )
    parser.add_argument("--n_expressions", type=int, default=2)
    parser.add_argument("--n_supervision", type=int, default=20000)
    parser.add_argument("--print-env", action="store_true")
    args = parser.parse_args()

    generate_dummy_data(
        args.root,
        subjects=tuple(args.subjects),
        n_expressions=args.n_expressions,
        n_supervision=args.n_supervision,
    )
    env = dummy_env(args.root)
    if args.print_env:
        for k, v in env.items():
            print(f"export {k}={v}")
    else:
        print(f"dummy data written to {args.root}")
        print("set these to use it:")
        for k, v in env.items():
            print(f"  {k}={v}")


if __name__ == "__main__":
    main()
