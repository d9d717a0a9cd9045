"""AppArgs-compatible CLI argument parser.

Parity with the reference's custom syntax (ref: src/cli/util/AppArgs.cpp:29-81):
  * `-Pkey=value` parameters, repeatable (multimap semantics)
  * `--flag` booleans
  * everything else ignored (positional args unused by the reference)
"""

from __future__ import annotations


class AppArgs:
    def __init__(self, argv: list[str]):
        self.params: dict[str, list[str]] = {}
        self.flags: set[str] = set()
        for a in argv:
            if a.startswith("-P") and "=" in a:
                k, v = a[2:].split("=", 1)
                self.params.setdefault(k, []).append(v)
            elif a.startswith("--"):
                self.flags.add(a[2:])

    def get(self, key: str, default: str | None = None) -> str | None:
        vals = self.params.get(key)
        return vals[0] if vals else default

    def get_all(self, key: str) -> list[str]:
        return list(self.params.get(key, []))

    def get_count(self, key: str) -> int:
        return len(self.params.get(key, []))

    def get_float(self, key: str, default: float) -> float:
        v = self.get(key)
        return float(v) if v is not None else default

    def get_int(self, key: str, default: int) -> int:
        v = self.get(key)
        return int(v) if v is not None else default

    def is_flag(self, name: str) -> bool:
        return name in self.flags
