"""Regenerate the checked-in guest ELF fixtures (tests/fixtures/guests/).

Usage: python scripts/build_guest_corpus.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from zkmips_tpu.guest import write_elf
from zkmips_tpu.guest.corpus import corpus

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "fixtures", "guests")


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, (program, _stdin) in corpus().items():
        data = write_elf(program)
        path = os.path.join(OUT, f"{name}.elf")
        with open(path, "wb") as fh:
            fh.write(data)
        print(f"{name}.elf: {len(data)} bytes")


if __name__ == "__main__":
    main()
