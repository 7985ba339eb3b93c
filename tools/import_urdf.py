"""Compile a URDF into this framework's native JSON robot spec.

Usage:
    python tools/import_urdf.py <robot.urdf> <out.json> [--armature A]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from wiki_grx_gym_tpu.models.urdf import compile_robot  # noqa: E402
from wiki_grx_gym_tpu.models.serialize import save_robot  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("urdf")
    ap.add_argument("out")
    ap.add_argument("--armature", type=float, default=0.0)
    args = ap.parse_args()
    model = compile_robot(args.urdf, armature=args.armature)
    save_robot(model, args.out)
    print(model.summary())


if __name__ == "__main__":
    main()
