"""Extract the reference keyframe CSV skills into our JSON asset schema
(bez_isaacgym_tpu/assets/trajectories/*.json).

Run once at development time (requires /root/reference mounted):

    python tools/extract_trajectories.py
"""

from __future__ import annotations

import csv
import json
import os

REF = "/root/reference/resources/library/trajectories/trajectories"
OUT = os.path.join(os.path.dirname(__file__), "..", "bez_isaacgym_tpu",
                   "assets", "trajectories")


def main():
    os.makedirs(OUT, exist_ok=True)
    for fname in sorted(os.listdir(REF)):
        if not fname.endswith(".csv"):
            continue
        name = fname[:-4]
        times = None
        joints = {}
        comments = None
        with open(os.path.join(REF, fname)) as f:
            for row in csv.reader(f):
                if not row:
                    continue
                key = row[0]
                if key == "time":
                    times = [float(x) for x in row[1:] if x != ""]
                elif key == "comment":
                    comments = row[1:]
                else:
                    joints[key] = [float(x) for x in row[1:] if x != ""]
        out = {"name": name, "times": times, "joints": joints,
               "comments": comments}
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}: {len(times)} keyframes, {len(joints)} joints")


if __name__ == "__main__":
    main()
