"""Generate the example meshes + configs in this directory.

    python examples/make_examples.py
    python -m drtvam_tpu examples/cylindrical.json --backend cpu

The configs mirror the reference's documented scenarios
(docs/src/basic_usage.rst + tests/files/*.json) at laptop-friendly
sizes; scale n_patterns/res*/film up for production runs.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply

HERE = os.path.dirname(os.path.abspath(__file__))


def base(vial, **kw):
    cfg = {
        "vial": vial,
        "projector": {"type": "collimated", "n_patterns": 120, "resx": 120,
                      "resy": 40, "pixel_size": 0.05,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 6, "scaley": 6, "scalez": 2,
                   "film": {"type": "vfilm", "resx": 120, "resy": 120,
                            "resz": 40}},
        "target": {"filename": "box_hole.ply", "size": 4.0},
        "loss": {"type": "threshold", "tl": 0.85, "tu": 0.95},
        "optimizer": {"type": "lbfgs"},
        "n_steps": 25,
    }
    cfg.update(kw)
    return cfg


MEDIUM = {"ior": 1.4, "extinction": 0.05, "albedo": 0.0}
SCAT = {"ior": 1.4, "extinction": 0.1, "albedo": 0.5,
        "phase": {"type": "rayleigh"}}

EXAMPLES = {
    "index_matched": base({"type": "index_matched", "r": 4.0,
                           "medium": MEDIUM}),
    "cylindrical": base({"type": "cylindrical", "r_int": 4.0, "r_ext": 4.4,
                         "ior": 1.54, "medium": MEDIUM}),
    "square": base({"type": "square", "w_int": 7.0, "w_ext": 8.0,
                    "ior": 1.54, "medium": MEDIUM},
                   filter_corner={"dist": 4.95, "radius": 0.15}),
    "scattering": base({"type": "cylindrical", "r_int": 4.0, "r_ext": 4.4,
                        "ior": 1.54, "medium": SCAT},
                       spp=4, spp_grad=4, progressive=True, n_steps=20),
    "filter_radon": base({"type": "cylindrical", "r_int": 4.0,
                          "r_ext": 4.4, "ior": 1.54, "medium": MEDIUM},
                         filter_radon=True),
    "surface_aware": base({"type": "cylindrical", "r_int": 4.0,
                           "r_ext": 4.4, "ior": 1.54, "medium": MEDIUM},
                          sensor={"type": "dda", "scalex": 6, "scaley": 6,
                                  "scalez": 2,
                                  "film": {"type": "vfilm", "resx": 60,
                                           "resy": 60, "resz": 20,
                                           "surface_aware": True}},
                          final_sensor={"type": "dda", "scalex": 6,
                                        "scaley": 6, "scalez": 2,
                                        "film": {"type": "vfilm",
                                                 "resx": 120, "resy": 120,
                                                 "resz": 40}}),
}


def main():
    save_ply(make_box_with_hole((2.0, 2.0, 0.8), 0.7,
                                hole_center_xy=(-0.9, 0.0), segments=63),
             os.path.join(HERE, "box_hole.ply"))
    for name, cfg in EXAMPLES.items():
        cfg = dict(cfg)
        cfg["output"] = os.path.join("out", name)
        with open(os.path.join(HERE, f"{name}.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        print(f"wrote examples/{name}.json")


if __name__ == "__main__":
    main()
