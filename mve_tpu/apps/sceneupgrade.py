"""sceneupgrade: legacy single-file .mve views -> current directory format
(reference: apps/sceneupgrade/sceneupgrade.cc).

The deprecated format stores each view in one binary container file
(view.h:151). This tool detects such files under views/ and reports them;
conversion of the historical container format is a compatibility shim —
scenes produced by this framework or current-reference MVE need no
upgrade (they already use view directories).
"""

from __future__ import annotations

import argparse
import os
import sys


def scene_upgrade(scene_path: str, verbose: bool = True) -> int:
    views_dir = os.path.join(scene_path, "views")
    if not os.path.isdir(views_dir):
        raise IOError(f"{scene_path}: missing views/ directory")
    legacy = [f for f in sorted(os.listdir(views_dir))
              if f.endswith(".mve") and os.path.isfile(os.path.join(views_dir, f))]
    current = [f for f in sorted(os.listdir(views_dir))
               if f.endswith(".mve") and os.path.isdir(os.path.join(views_dir, f))]
    if verbose:
        print(f"Scene {scene_path}: {len(current)} current view dirs, "
              f"{len(legacy)} legacy single-file views.")
    if legacy:
        raise NotImplementedError(
            "Legacy single-file .mve containers present; the historical "
            "binary container format is not supported by this framework — "
            "run the reference's sceneupgrade once, or re-import images.")
    return len(current)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sceneupgrade",
                                description="Check/upgrade scene format.")
    p.add_argument("scene", help="Scene directory")
    args = p.parse_args(argv)
    scene_upgrade(args.scene)
    return 0


if __name__ == "__main__":
    sys.exit(main())
