"""(Re)generate the bundled smoke dataset + its list sets.

The committed ``dataset/sceneflow_part/`` + ``dataloaders/lists/sceneflow_part``
files are this script's deterministic output (seed 0) — the analog of the
reference's bundled 5-pair ``dataset/sceneflow_part`` + demo lists.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from leastereo_tpu.data.demo import generate_demo_dataset, generate_kitti_demo_dataset


def main():
    entries = generate_demo_dataset("dataset/sceneflow_part", num_pairs=5)
    lists_dir = "dataloaders/lists/sceneflow_part"
    os.makedirs(lists_dir, exist_ok=True)
    # 5 pairs across the five splits (reference sceneflow_demo has 2-3 entries
    # per split, reused across splits).
    splits = {
        "search_weights.list": entries[0:2],
        "search_arch.list": entries[2:4],
        "train.list": entries[0:4],
        "val.list": entries[4:5],
        "test.list": entries[4:5],
    }
    for fn, lines in splits.items():
        with open(os.path.join(lists_dir, fn), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {len(entries)} pairs to dataset/sceneflow_part + lists to {lists_dir}")

    # KITTI-2015-layout twin (sparse lidar-like GT) for the fine-tune smoke
    # (reference recipe train_kitti15.sh).
    kitti = generate_kitti_demo_dataset("dataset/kitti15_part", num_pairs=5)
    kdir = "dataloaders/lists/kitti15_part"
    os.makedirs(kdir, exist_ok=True)
    ksplits = {
        "search_weights.list": kitti[0:2],
        "search_arch.list": kitti[2:4],
        "train.list": kitti[0:4],
        "val.list": kitti[4:5],
        "test.list": kitti[4:5],
    }
    for fn, lines in ksplits.items():
        with open(os.path.join(kdir, fn), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {len(kitti)} pairs to dataset/kitti15_part + lists to {kdir}")


if __name__ == "__main__":
    main()
