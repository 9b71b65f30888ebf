"""REPL command-parser tests (inspect_model CLI surface)."""

import shlex
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from inspect_model import parse_input  # noqa: E402


def test_reconstruct_command():
    args = parse_input(shlex.split(
        "reconstruct \"i do not know\" -n 3 "
        "--latent_values '{\"polarity\": 1.0}'"))
    assert args.cmd == "reconstruct"
    assert args.sentence == "i do not know"
    assert args.n == 3
    assert args.latent_values == {"polarity": 1.0}


def test_reconstruct_latent_values_json():
    args = parse_input(["reconstruct", "hi", "--latent_values",
                        '{"polarity": 1.5}'])
    assert args.latent_values == {"polarity": 1.5}


def test_sample_command_with_pins():
    args = parse_input(["sample", "5", "--polz", "-1.0", "--uncz", "0.5"])
    assert args.cmd == "sample" and args.n == 5
    assert args.polz == -1.0 and args.uncz == 0.5


def test_transfer_command():
    args = parse_input(["transfer", "src sent", "trg sent",
                        "--latent_names", "polarity", "uncertainty"])
    assert args.cmd == "transfer"
    assert args.latent_names == ["polarity", "uncertainty"]


def test_difference_encode_interpolate():
    a = parse_input(["difference", "a", "b", "-n", "2"])
    assert a.cmd == "difference" and a.n == 2
    b = parse_input(["encode", "a"])
    assert b.cmd == "encode" and b.n == 1
    c = parse_input(["interpolate", "a", "b", "--latent_name", "content",
                     "--steps", "4"])
    assert c.cmd == "interpolate" and c.steps == 4
