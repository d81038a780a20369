"""Random hyperparameter-search config generator
(ref: tune_hyperparameters.py): writes N_exp derived configs with fields
drawn from ``randint(a,b)`` / ``randfloat(a,b)`` / ``choose_str{a|b|c}``
specs.

usage: python -m pytorch_kaldi_cgs_tpu.bin.tune_hyperparameters \
         <cfg> <out_folder> <N_exp> field=randfloat(0.001,0.01) ...
"""

from __future__ import annotations

import os
import random
import re
import sys


def sample_value(spec: str, rng: random.Random):
    m = re.search(r"randint\((.+?)\)", spec)
    if m:
        lo, hi = m.group(1).split(",")
        return str(rng.randint(int(lo), int(hi)))
    m = re.search(r"randfloat\((.+?)\)", spec)
    if m:
        lo, hi = m.group(1).split(",")
        return str(rng.uniform(float(lo), float(hi)))
    m = re.search(r"choose_str\{(.+)\}", spec)
    if m:
        return rng.choice(m.group(1).split("|"))
    raise ValueError("unknown hyperparameter spec %r" % spec)


def generate(cfg_file: str, output_folder: str, n_exp: int,
             hyperparams: list, seed: int = 1234) -> list:
    rng = random.Random(seed)
    os.makedirs(output_folder, exist_ok=True)
    specs = {}
    for hp in hyperparams:
        key, spec = hp.split("=", 1)
        specs[key] = spec
    out_files = []
    for i in range(n_exp):
        out_path = os.path.join(output_folder, "exp%d.cfg" % i)
        with open(out_path, "w") as out:
            for line in open(cfg_file):
                key = line.split("=")[0].strip()
                if key == "out_folder":
                    line = "out_folder = %s/exp%d\n" % (output_folder, i)
                elif key in specs:
                    line = "%s = %s\n" % (key, sample_value(specs[key], rng))
                out.write(line)
        out_files.append(out_path)
    return out_files


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 2
    files = generate(argv[0], argv[1], int(argv[2]), argv[3:])
    print("\n".join(files))
    return 0


if __name__ == "__main__":
    sys.exit(main())
