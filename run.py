"""CLI entry point: `python run.py config.json [--verbose]`.

Public interface matches the reference driver (reference run.py:32-40,
658-660); all orchestration lives in dvae_tpu.training.driver.
"""

import argparse

from dvae_tpu.utils import apply_platform_override

apply_platform_override()  # DVAE_PLATFORM=cpu|... before any backend init

from dvae_tpu.training.driver import run  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("params_json", type=str,
                        help="Path to JSON experiment config.")
    parser.add_argument("--verbose", action="store_true", default=False,
                        help="Print progress information.")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    run(args.params_json, verbose=args.verbose)
