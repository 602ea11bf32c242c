"""Result export (S10/M17): json / txt / csv streaming dumps.

Behavioral parity with pyspider/libs/result_dump.py:

- ``result_formater``  (:16-43) — intersect the key sets of dict
  results; each row splits into ``result_formated`` (common fields) and
  ``others`` (the rest; or the raw value for non-dict results).
- ``dump_as_json``     (:46-60) — one JSON object per line; ``valid``
  wraps in a JSON array.
- ``dump_as_txt``      (:63-68) — ``url \t json(result)`` lines.
- ``dump_as_csv``      (:71-133) — header from the common fields of the
  first 30 rows (sorted), then ``url, *common, others`` rows.

All three are generators over row dicts, usable directly on
``Dataset.iter_rows()`` / a list of result rows, so exports stream —
they never materialize the dataset.
"""

from __future__ import annotations

import csv
import io
import itertools
import json
from typing import Iterable, Iterator


def result_formater(results: list[dict]) -> tuple[set, list[dict]]:
    common: set | None = None
    for row in results:
        row.setdefault("result", None)
        if isinstance(row["result"], dict):
            keys = set(row["result"].keys())
            common = keys if common is None else (common & keys)
        else:
            common = set()
    for row in results:
        row["result_formated"] = {}
        if not common or not isinstance(row["result"], dict):
            row["others"] = row["result"]
        else:
            formated, others = {}, {}
            for key, value in row["result"].items():
                (formated if key in common else others)[key] = value
            row["result_formated"] = formated
            row["others"] = others
    return common or set(), results


def dump_as_json(results: Iterable[dict], valid: bool = False) -> Iterator[str]:
    first = True
    if valid:
        yield "["
    for row in results:
        if valid and not first:
            yield ", "
        first = False
        yield json.dumps(row, ensure_ascii=False, default=str) + "\n"
    if valid:
        yield "]"


def dump_as_txt(results: Iterable[dict]) -> Iterator[str]:
    for row in results:
        yield (str(row.get("url")) + "\t" +
               json.dumps(row.get("result"), ensure_ascii=False, default=str)
               + "\n")


def dump_as_csv(results: Iterable[dict]) -> Iterator[str]:
    def to_str(obj) -> str:
        if isinstance(obj, bytes):
            return obj.decode("utf8", "replace")
        if isinstance(obj, str):
            return obj
        return json.dumps(obj, ensure_ascii=False, default=str)

    buf = io.StringIO()
    writer = csv.writer(buf)
    it = iter(results)
    head = list(itertools.islice(it, 30))
    common, _ = result_formater(head)
    columns = sorted(common)
    writer.writerow(["url"] + columns + ["..."])
    for row in itertools.chain(head, it):
        row["result_formated"] = {}
        if not common or not isinstance(row.get("result"), dict):
            row["others"] = row.get("result")
        else:
            formated, others = {}, {}
            for key, value in row["result"].items():
                (formated if key in common else others)[key] = value
            row["result_formated"] = formated
            row["others"] = others
        writer.writerow([to_str(row.get("url"))]
                        + [to_str(row["result_formated"].get(c, ""))
                           for c in columns]
                        + [to_str(row["others"])])
        yield buf.getvalue()
        buf.truncate(0)
        buf.seek(0)


def export_results(rows: Iterable[dict], fmt: str, path: str) -> int:
    """Stream an iterable of result rows to a file; returns chunk count."""
    gens = {"json": dump_as_json, "txt": dump_as_txt, "csv": dump_as_csv}
    n = 0
    with open(path, "w") as f:
        for chunk in gens[fmt](rows):
            f.write(chunk)
            n += 1
    return n
