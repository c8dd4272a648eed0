"""Synthesize data.bin — the analogue of the reference's
examples/generic/create_in_field.f90: a 32^3 double field, a 64^3 double
field and a float scalar, written as Fortran sequential records with
4-byte markers."""
import struct

import numpy as np


def fortran_record(payload: bytes) -> bytes:
    return struct.pack("<I", len(payload)) + payload + \
        struct.pack("<I", len(payload))


def main():
    out = b""
    for n in (32, 64):
        i = np.arange(n)
        fld = (10.0 * np.sin(i / 16.0)[None, None, :]
               * np.sin(i / 16.0)[None, :, None] ** 2
               * np.cos(i / 16.0)[:, None, None])
        out += fortran_record(fld.astype("<f8").tobytes())
    out += fortran_record(np.float32(3.25).tobytes())
    with open("data.bin", "wb") as f:
        f.write(out)
    print("wrote data.bin")


if __name__ == "__main__":
    main()
