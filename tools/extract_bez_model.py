"""Extract the Bez robot description from the reference URDFs into our
canonical JSON asset schema (bez_isaacgym_tpu/assets/*.json).

Run once at development time (requires /root/reference to be mounted):

    python tools/extract_bez_model.py

The JSON assets are the shipped source of truth; the framework does not read
URDF at runtime (though models/urdf.py can parse user-supplied URDFs).
Link/joint names are normalized by stripping the URDF's leading '/'.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bez_isaacgym_tpu.models.urdf import parse_urdf  # noqa: E402

REF = "/root/reference/resources/assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "bez_isaacgym_tpu", "assets")

VARIANTS = {
    "bez_box": "bez/model/soccerbot_box.urdf",
    "bez_box_sensor": "bez/model/soccerbot_box_sensor.urdf",
    "bez_stl": "bez/model/soccerbot_stl.urdf",
    "bez_stl_col": "bez/model/soccerbot_stl_COL.urdf",
    "bez_stl_sensor": "bez/model/soccerbot_stl_sensor.urdf",
    "ball": "objects/ball.urdf",
}


def normalize(spec):
    for l in spec.links:
        l.name = l.name.lstrip("/")
    for j in spec.joints:
        j.name = j.name.lstrip("/")
        j.parent = j.parent.lstrip("/")
        j.child = j.child.lstrip("/")
    return spec


def main():
    os.makedirs(OUT, exist_ok=True)
    for out_name, rel in VARIANTS.items():
        spec = normalize(parse_urdf(os.path.join(REF, rel)))
        path = os.path.join(OUT, f"{out_name}.json")
        with open(path, "w") as f:
            f.write(spec.to_json())
        print(f"wrote {path}: {len(spec.links)} links, {len(spec.joints)} joints")


if __name__ == "__main__":
    main()
