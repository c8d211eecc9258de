"""Observability: tab-separated symbol logs and stdout teeing.

Rebuilds the reference logging surface (myLogger.lua:40-193 and
myCmdLine's `:log` tee, myCmdLine.lua:191-221): `SymbolLogger` appends
named values as TSV rows with a header derived from the first `add`
(used for train.log / test.log per epoch); `TeeLogger` duplicates stdout
into `<save>/log`. Gnuplot rendering is deliberately not ported
(SURVEY.md §7 'deliberately not ported')."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, Iterable, Optional


class SymbolLogger:
    """Tab-separated per-epoch metric log (myLogger.lua:40-135)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._names: Optional[list] = None
        if self.path.exists():
            header = self.path.read_text().splitlines()
            if header:
                self._names = header[0].split("\t")

    def add(self, symbols: Dict[str, float]) -> None:
        if self._names is None:
            self._names = list(symbols.keys())
            with open(self.path, "a") as f:
                f.write("\t".join(self._names) + "\n")
        missing = set(symbols) - set(self._names)
        if missing:
            raise ValueError(f"unknown log symbols {sorted(missing)}; "
                             f"header has {self._names}")
        row = [f"{float(symbols.get(n, float('nan'))):.6g}" for n in self._names]
        with open(self.path, "a") as f:
            f.write("\t".join(row) + "\n")

    def read(self) -> Dict[str, list]:
        lines = self.path.read_text().splitlines()
        names = lines[0].split("\t")
        cols: Dict[str, list] = {n: [] for n in names}
        for line in lines[1:]:
            for n, v in zip(names, line.split("\t")):
                cols[n].append(float(v))
        return cols


class TeeLogger:
    """Duplicate stdout into a logfile (myCmdLine.lua:191-221)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._file = open(self.path, "a")
        self._stdout = sys.stdout

    def __enter__(self):
        sys.stdout = self
        return self

    def __exit__(self, *exc):
        sys.stdout = self._stdout
        self._file.close()

    def write(self, s: str):
        self._stdout.write(s)
        self._file.write(s)

    def flush(self):
        self._stdout.flush()
        self._file.flush()
