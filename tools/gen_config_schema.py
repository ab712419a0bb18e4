#!/usr/bin/env python
"""Extract the WRF namelist-record schema from the reference Fortran.

The reference carries the full WRF V3.4.1 namelist record
``grid_config_rec_type`` — ~1,796 scalar fields of four Fortran types
(reference: module_configure.f90:3-1800) — and a 26-int C projection
(config_flags.h:4-31).  The *schema* (field names + types + order) is the
configuration API surface the framework must reproduce; this script parses
the declarations and emits it as JSON data consumed by wrf_tpu/config.py.
Only names/types are extracted — no code is derived from the reference.

Usage: python tools/gen_config_schema.py [reference_dir] [out.json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

DECL_RE = re.compile(
    r"^\s*(integer|real|logical|character\*256)\s*::\s*([A-Za-z0-9_]+)\s*$",
    re.IGNORECASE,
)
CFLAG_RE = re.compile(r"^\s*int\s+([A-Za-z0-9_]+)\s*;")

TYPE_MAP = {
    "integer": "int",
    "real": "float",
    "logical": "bool",
    "character*256": "str",
}


def parse_fortran_record(path: Path) -> list[dict]:
    fields = []
    in_type = False
    for line in path.read_text().splitlines():
        s = line.strip().lower()
        if s.startswith("type grid_config_rec_type"):
            in_type = True
            continue
        if in_type and s.startswith("end type"):
            break
        if in_type:
            m = DECL_RE.match(line)
            if m:
                ftype, name = m.group(1).lower(), m.group(2).lower()
                fields.append({"name": name, "type": TYPE_MAP[ftype]})
    return fields


def parse_c_projection(path: Path) -> list[str]:
    names = []
    for line in path.read_text().splitlines():
        m = CFLAG_RE.match(line)
        if m:
            names.append(m.group(1))
    return names


def main() -> None:
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parents[1] / "wrf_tpu" / "config_schema.json"
    )
    record = parse_fortran_record(ref / "module_configure.f90")
    projection = parse_c_projection(ref / "config_flags.h")
    schema = {
        "source": "WRF V3.4.1 grid_config_rec_type (module_configure.f90) "
                  "and config_flags.h projection",
        "record_fields": record,
        "c_projection": projection,
    }
    out.write_text(json.dumps(schema, indent=1))
    counts = {}
    for f in record:
        counts[f["type"]] = counts.get(f["type"], 0) + 1
    print(f"wrote {out}: {len(record)} record fields {counts}, "
          f"{len(projection)} projection fields")


if __name__ == "__main__":
    main()
