"""Container header inspector (tools/dctz-dump.c:17-56 equivalent).

Usage: python -m dctz_tpu.tools.dctz_dump <file.z> [...]
"""

from __future__ import annotations

import json
import sys


def dump(path: str) -> dict:
    from ..core import container as ct

    blob = open(path, "rb").read()
    fmt = ct.detect_format(blob)
    if fmt == "v2":
        hdr, streams, qtable, chunk_bytes = ct.parse_v2(blob)
        chunks = [len(s) for s in streams]
    else:
        hdr, bz, dz, az, qtable = ct.parse_v1(blob)
        chunks = [1, 1, 1]
    return {
        "file": path,
        "format": fmt,
        "datatype": hdr.dtype.name,
        "num_elements": hdr.num_elements,
        "error_bound": hdr.error_bound,
        "mode": hdr.mode,
        "tot_AC_exact_count": hdr.ac_count,
        "scaling_factor": hdr.scaling_factor,
        "mean": hdr.mean,
        "bindex_sz_compressed": hdr.bindex_nbytes,
        "DC_sz_compressed": hdr.dc_nbytes,
        "AC_exact_sz_compressed": hdr.ac_nbytes,
        "chunks_per_stream": chunks,
        "has_qtable": qtable is not None,
        "total_bytes": len(blob),
    }


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: dctz_dump <file.z> [...]", file=sys.stderr)
        return 2
    for path in argv:
        print(json.dumps(dump(path), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
