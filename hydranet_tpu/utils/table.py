"""Minimal ASCII table (replacement for the reference's prettytable usage,
/root/reference/model/train.py:215-225; prettytable is not in this image)."""

from __future__ import annotations

from typing import List, Sequence


def format_table(field_names: Sequence[str], rows: Sequence[Sequence]) -> str:
    cols = [str(f) for f in field_names]
    str_rows = [[str(c) for c in row] for row in rows]
    widths = [max(len(cols[i]), *(len(r[i]) for r in str_rows)) if str_rows
              else len(cols[i]) for i in range(len(cols))]

    def line(ch="-", junction="+"):
        return junction + junction.join(ch * (w + 2) for w in widths) + junction

    def fmt_row(cells):
        return "| " + " | ".join(c.center(w) for c, w in zip(cells, widths)) + " |"

    out: List[str] = [line(), fmt_row(cols), line()]
    for r in str_rows:
        out.append(fmt_row(r))
    out.append(line())
    return "\n".join(out)
