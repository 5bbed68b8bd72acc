"""AST <-> JSON for shipping query plans into grouped-UDF workers."""

from __future__ import annotations

import json

from ..core.parser import And, Not, Or, Part, Word


def to_dict(p: Part) -> dict:
    if isinstance(p, Word):
        return {"w": p.text}
    if isinstance(p, And):
        return {"and": [to_dict(p.left), to_dict(p.right)]}
    if isinstance(p, Or):
        return {"or": [to_dict(p.left), to_dict(p.right)]}
    return {"not": to_dict(p.part)}


def from_dict(d: dict) -> Part:
    if "w" in d:
        return Word(d["w"])
    if "and" in d:
        return And(from_dict(d["and"][0]), from_dict(d["and"][1]))
    if "or" in d:
        return Or(from_dict(d["or"][0]), from_dict(d["or"][1]))
    return Not(from_dict(d["not"]))


def dumps(p: Part) -> str:
    return json.dumps(to_dict(p))


def loads(s: str) -> Part:
    return from_dict(json.loads(s))
