"""List an image folder into a JSON manifest (reference
create_dataset_json.py:1-19, with the hardcoded paths made into flags)."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Create a JSON manifest of images")
    p.add_argument("--src_folder", type=str, required=True)
    p.add_argument("--output_json", type=str, required=True)
    args = p.parse_args(argv)
    files = sorted(
        f for f in os.listdir(args.src_folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    with open(args.output_json, "w") as f:
        json.dump({"images": files, "root": os.path.abspath(args.src_folder)}, f,
                  indent=2)
    print(f"wrote {len(files)} entries to {args.output_json}")


if __name__ == "__main__":
    main()
