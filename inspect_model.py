"""Interactive inference REPL: `python inspect_model.py config.json`.

Command surface matches the reference (inspect_model.py:70-130, 339-399):
  reconstruct "sentence" [-n N] [--latent_values '{"polarity": 1.0}']
  sample N [--polz F] [--uncz F]
  difference "s1" "s2" [-n N]
  encode "sentence" [-n N]
  transfer "source" "target" --latent_names a b [-n N]
  interpolate "s1" "s2" --latent_name NAME [--steps K]   (implemented here;
      the reference declared it but raised NotImplementedError)
Ctrl-D to quit.
"""

import argparse
import json
import shlex

import numpy as np

from dvae_tpu.utils import apply_platform_override

apply_platform_override()  # DVAE_PLATFORM=cpu|... before any backend init


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("params_json", type=str)
    return p.parse_args()


def parse_input(input_args):
    cmd_parser = argparse.ArgumentParser()
    cmd_parser.set_defaults(cmd="")
    sub = cmd_parser.add_subparsers()

    rec = sub.add_parser("reconstruct")
    rec.set_defaults(cmd="reconstruct")
    rec.add_argument("sentence", type=str)
    rec.add_argument("--latent_values", type=json.loads, default={})
    rec.add_argument("-n", type=int, default=1)

    samp = sub.add_parser("sample")
    samp.set_defaults(cmd="sample")
    samp.add_argument("n", type=int)
    samp.add_argument("--polz", type=float, default=None)
    samp.add_argument("--uncz", type=float, default=None)

    diff = sub.add_parser("difference")
    diff.set_defaults(cmd="difference")
    diff.add_argument("sentence1", type=str)
    diff.add_argument("sentence2", type=str)
    diff.add_argument("-n", type=int, default=1)

    enc = sub.add_parser("encode")
    enc.set_defaults(cmd="encode")
    enc.add_argument("sentence", type=str)
    enc.add_argument("-n", type=int, default=1)

    tr = sub.add_parser("transfer")
    tr.set_defaults(cmd="transfer")
    tr.add_argument("source", type=str)
    tr.add_argument("target", type=str)
    tr.add_argument("--latent_names", nargs="+", type=str, default=[])
    tr.add_argument("-n", type=int, default=1)

    itp = sub.add_parser("interpolate")
    itp.set_defaults(cmd="interpolate")
    itp.add_argument("sentence1", type=str)
    itp.add_argument("sentence2", type=str)
    itp.add_argument("--latent_name", type=str, default="content")
    itp.add_argument("--steps", type=int, default=5)

    return cmd_parser.parse_args(input_args)


def print_decoded(session, decoded_tokens, all_zs, header):
    """Table of decoded text + per-latent z (scalar or norm) + discriminator
    prediction (reference inspect_model.py:250-274)."""
    width = max((len(" ".join(t)) for t in decoded_tokens), default=10) + 2
    names = list(all_zs[0].keys())
    name_str = " | ".join(f"{n:^12}" for n in names)
    print(f"|{header:^{width}}|   {name_str} |")
    print("-" * (width + len(name_str) + 7))
    for tokens, zs in zip(decoded_tokens, all_zs):
        cells = []
        for name, z in zs.items():
            z = np.asarray(z)
            pred = session.discriminator_prediction(name, z)
            pred = "_" if pred is None else pred
            val = float(z.reshape(-1)[0]) if z.size == 1 \
                else float(np.linalg.norm(z))
            cells.append(f"{val:^8.4f} ({pred})")
        print(f"|{' '.join(tokens):^{width}}|   {' | '.join(cells)} |")
    print("-" * (width + len(name_str) + 7))
    print()


def main():
    args = parse_args()
    from dvae_tpu.inference import InferenceSession
    session = InferenceSession(args.params_json)
    print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~")
    print(f"Loaded checkpoint {session.ckpt_name}")
    print("Enter a command at the prompt. Ctrl-D to quit.")
    print("Commands: reconstruct / sample / encode / difference / "
          "transfer / interpolate  (add -h for options)")
    print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~\n")
    while True:
        try:
            inp = input("> ")
            parsed = parse_input(shlex.split(inp))
            if parsed.cmd == "reconstruct":
                toks, zs = session.reconstruct(
                    parsed.sentence, n=parsed.n,
                    latent_values=parsed.latent_values)
                print_decoded(session, toks, zs, "RECONSTRUCT")
            elif parsed.cmd == "sample":
                toks, zs = session.sample_prior(
                    parsed.n, pins={"polarity": parsed.polz,
                                    "uncertainty": parsed.uncz})
                print_decoded(session, toks, zs, "SAMPLE")
            elif parsed.cmd == "difference":
                for d in session.difference(parsed.sentence1,
                                            parsed.sentence2, n=parsed.n):
                    print(np.asarray(d))
            elif parsed.cmd == "encode":
                for z in session.encode_many(parsed.sentence, n=parsed.n):
                    print(np.asarray(z))
            elif parsed.cmd == "transfer":
                toks, zs = session.transfer(parsed.source, parsed.target,
                                            parsed.latent_names, n=parsed.n)
                print_decoded(session, toks, zs, "TRANSFER")
            elif parsed.cmd == "interpolate":
                toks, zs = session.interpolate(
                    parsed.sentence1, parsed.sentence2,
                    parsed.latent_name, steps=parsed.steps)
                print_decoded(session, toks, zs, "INTERPOLATE")
            else:
                print(f"Unknown command {parsed.cmd!r}")
        except EOFError:
            return
        except KeyboardInterrupt:
            continue
        except SystemExit:
            continue


if __name__ == "__main__":
    main()
