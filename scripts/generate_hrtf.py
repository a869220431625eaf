#!/usr/bin/env python
"""Generate the shipped HRTF gain table (rayverb_tpu/hrtf/hrtf_table.npz).

Re-implementation of the reference's offline HRTF pipeline
(hrtf_analysis/analyse_hrtf.py): either analyse a directory of IRCAM
Listen HRIR WAVs, or synthesise the default Brown-Duda spherical-head
table. The output feeds HrtfAttenuator lookups at runtime.

Usage:
  python scripts/generate_hrtf.py                    # synthetic default
  python scripts/generate_hrtf.py --ircam DIR        # measured corpus
  python scripts/generate_hrtf.py --out custom.npz
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ircam", default=None,
                        help="directory of IRCAM Listen HRIR WAVs")
    parser.add_argument(
        "--out",
        default=os.path.join(REPO, "rayverb_tpu", "hrtf", "hrtf_table.npz"),
    )
    args = parser.parse_args(argv)

    import numpy as np

    from rayverb_tpu.hrtf.table import (
        analyze_hrir_directory,
        interpolate_measurements,
        synthetic_measurements,
    )

    if args.ircam:
        table = analyze_hrir_directory(args.ircam)
        source = f"IRCAM corpus at {args.ircam}"
    else:
        table = interpolate_measurements(synthetic_measurements())
        source = "synthetic Brown-Duda spherical-head model"

    np.savez_compressed(args.out, table=table.astype(np.float32))
    print(f"wrote {args.out} shape={table.shape} ({source})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
