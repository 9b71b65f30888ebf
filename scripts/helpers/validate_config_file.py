"""Validate an experiment config file (reference scripts/helpers/
validate_config_file.py)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse
import json

from dvae_tpu.config import validate_params

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config_file", type=str)
    args = parser.parse_args()
    with open(args.config_file) as f:
        validate_params(json.load(f))
    print(f"{args.config_file} OK")
