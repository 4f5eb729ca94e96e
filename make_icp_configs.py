#!/usr/bin/env python
"""Generate the ICP baseline config matrix: 8 datasets x 5 variants
(equivalent of reference make_icp_configs.py:6-26).

Variants: o3_p2p (plain constrained p2point), o3_gicp (global registration),
o3_gicp_p2p (global + p2p refine), o3_gicp_fast (fast global),
o3_gicp_fast_p2p (fast global + p2p refine).
"""

import json
import os

DATASETS = [
    "SynthCars", "SynthCarsPersons", "Synth20", "Synth20others",
    "KITTITrackletsCars", "KITTITrackletsCarsPersons",
    "KITTITrackletsCarsHard", "KITTITrackletsCarsPersonsHard",
]

VARIANTS = {
    "o3_p2p": {"variant": "p2point"},
    "o3_gicp": {"variant": "o3_gicp"},
    "o3_gicp_p2p": {"variant": "o3_gicp", "refine": "p2p"},
    "o3_gicp_fast": {"variant": "o3_gicp_fast"},
    "o3_gicp_fast_p2p": {"variant": "o3_gicp_fast", "refine": "p2p"},
}


def main(basedir: str = "configs", data_root: str = "data"):
    os.makedirs(basedir, exist_ok=True)
    names = []
    for dataset in DATASETS:
        for vname, icp in VARIANTS.items():
            cfg = {
                "data": {"basepath": f"{data_root}/{dataset}"},
                "evaluation": {
                    "special": {
                        "mode": "icp",
                        "icp": {"with_constraint": True, **icp},
                    }
                },
            }
            name = f"icp_{dataset}_{vname}"
            path = os.path.join(basedir, f"{name}.json")
            with open(path, "w") as f:
                json.dump(cfg, f, indent=4)
                f.write("\n")
            names.append(name)
    print(f"wrote {len(names)} configs")
    return names


if __name__ == "__main__":
    main()
