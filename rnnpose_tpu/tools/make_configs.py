"""Per-object experiment config generation.

Re-design of the reference's `config/linemod/copy.sh` (stamps SEQ_NAME into
13 per-class YAML files from `template_fw0.5.yml`): emits one YAML per
LINEMOD class that overrides only the class-dependent fields of the default
schema (`rnnpose_tpu/config/defaults.py`).

Usage:
  python -m rnnpose_tpu.tools.make_configs --out_dir config/linemod \
      --info_root /data/infos --data_root /data/LM6d [--occ]
"""
from __future__ import annotations

import argparse
import os

import yaml

from ..data.linemod_config import LINEMOD_CLASSES


def class_config(cls: str, info_root: str, data_root: str, occ: bool = False):
    suffix = "occ" if occ else "std"
    return {
        "model": {"seq_names": [cls]},
        "train_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [
                        os.path.join(info_root, f"{cls}_train_real.info"),
                        os.path.join(info_root, f"{cls}_train_syn.info"),
                    ],
                    "root_paths": [data_root, data_root],
                    "model_dir": os.path.join(data_root, "models"),
                    "class_names": [cls],
                }
            }
        },
        "eval_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [
                        os.path.join(info_root, f"{cls}_test_{suffix}.info")
                    ],
                    "root_paths": [data_root],
                    "model_dir": os.path.join(data_root, "models"),
                    "class_names": [cls],
                    # Occlusion LINEMOD evaluates from PVNet inits
                    # (reference template_fw0.5_occ.yml:162-164).
                    "init_pose_type": (
                        "PVNET_LINEMOD_OCC" if occ else "POSECNN_LINEMOD"
                    ),
                }
            }
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--info_root", default="EXPDATA/infos")
    p.add_argument("--data_root", default="EXPDATA/LM6d_converted")
    p.add_argument("--occ", action="store_true")
    p.add_argument("--classes", nargs="*", default=None)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    classes = args.classes or LINEMOD_CLASSES
    for cls in classes:
        cfg = class_config(cls, args.info_root, args.data_root, args.occ)
        name = f"{cls}_fw0.5{'_occ' if args.occ else ''}.yml"
        with open(os.path.join(args.out_dir, name), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
