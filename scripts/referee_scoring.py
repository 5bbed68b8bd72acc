#!/usr/bin/env python
"""Differential referee: core/oracle.py vs the COMPILED reference engine.

Compiles the reference crate VERBATIM (``/root/reference/src/lib.rs`` —
nothing from the reference is checked into this repo) against ~200-line
shims of its two public crates.io deps (`iter-set` sorted-merge ops,
`strsim` generic_jaro/generic_hamming — the same state machine ported in
core/similarity.py), plus a thin stdin/stdout harness binary.  Then drives
random corpora and queries through BOTH engines and compares, per query:

- parse / stray-NOT error classes,
- the document-retrieval id list,
- every Hit: doc id, start, word id, the f32 rating AT BIT LEVEL, and the
  full associated-occurrence set — in emission order.

This pins the whole scoring pipeline (occurrence streams, MergeProximate,
progressive AND/OR/AND-NOT mergers, the final adjacency fold, fuzzy
expansion incl. first-char pruning, dense-id reuse after removals)
against the reference's actual code, not a hand port of it.  It is the
strongest evidence behind the oracle-less ``ft_query_hits`` gate.

Skips cleanly (exit 0, message) when rustc or the reference is absent.

Usage: python scripts/referee_scoring.py [N_CORPORA] (default 25)
"""

from __future__ import annotations

import json
import random
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REF_LIB_RS = Path("/root/reference/src/lib.rs")

ITER_SET_SHIM = r"""
//! Minimal shim of the public `iter-set` 2.x API surface the reference uses:
//! sorted-iterator set operations with left-preference on equal items.
use std::cmp::Ordering;
use std::iter::Peekable;

#[derive(Debug, Clone, PartialEq, Eq)]
pub enum Inclusion<T> {
    Left(T),
    Both(T, T),
    Right(T),
}

pub struct SetOp<L: Iterator, R: Iterator> {
    l: Peekable<L>,
    r: Peekable<R>,
    mode: u8, // 0 intersection, 1 union, 2 difference
}

impl<T: Ord, L: Iterator<Item = T>, R: Iterator<Item = T>> Iterator for SetOp<L, R> {
    type Item = T;
    fn next(&mut self) -> Option<T> {
        loop {
            match (self.l.peek(), self.r.peek()) {
                (Some(a), Some(b)) => match a.cmp(b) {
                    Ordering::Less => {
                        let x = self.l.next().unwrap();
                        match self.mode {
                            1 | 2 => return Some(x),
                            _ => {}
                        }
                    }
                    Ordering::Greater => {
                        let y = self.r.next().unwrap();
                        if self.mode == 1 {
                            return Some(y);
                        }
                    }
                    Ordering::Equal => {
                        let x = self.l.next().unwrap();
                        let _ = self.r.next();
                        match self.mode {
                            0 | 1 => return Some(x),
                            _ => {}
                        }
                    }
                },
                (Some(_), None) => {
                    let x = self.l.next().unwrap();
                    match self.mode {
                        1 | 2 => return Some(x),
                        _ => return None,
                    }
                }
                (None, Some(_)) => {
                    let y = self.r.next().unwrap();
                    if self.mode == 1 {
                        return Some(y);
                    }
                    return None;
                }
                (None, None) => return None,
            }
        }
    }
}

fn op<T: Ord, L: IntoIterator<Item = T>, R: IntoIterator<Item = T>>(
    a: L,
    b: R,
    mode: u8,
) -> SetOp<L::IntoIter, R::IntoIter> {
    SetOp { l: a.into_iter().peekable(), r: b.into_iter().peekable(), mode }
}

pub fn intersection<T: Ord, L: IntoIterator<Item = T>, R: IntoIterator<Item = T>>(
    a: L,
    b: R,
) -> SetOp<L::IntoIter, R::IntoIter> {
    op(a, b, 0)
}

pub fn union<T: Ord, L: IntoIterator<Item = T>, R: IntoIterator<Item = T>>(
    a: L,
    b: R,
) -> SetOp<L::IntoIter, R::IntoIter> {
    op(a, b, 1)
}

pub fn difference<T: Ord, L: IntoIterator<Item = T>, R: IntoIterator<Item = T>>(
    a: L,
    b: R,
) -> SetOp<L::IntoIter, R::IntoIter> {
    op(a, b, 2)
}
"""

STRSIM_SHIM = r"""
//! Minimal shim of the public `strsim` 0.11 API surface the reference uses.
//! generic_jaro mirrors strsim's match/transposition state machine (the same
//! one ported in elipdotter_spark/core/similarity.py and cross-engine gated).

#[derive(Debug, Clone, PartialEq, Eq)]
pub enum StrSimError {
    DifferentLengthArgs,
}

pub type HammingResult = Result<usize, StrSimError>;

pub fn generic_hamming<Iter1, Iter2, Elem1, Elem2>(a: Iter1, b: Iter2) -> HammingResult
where
    Iter1: IntoIterator<Item = Elem1>,
    Iter2: IntoIterator<Item = Elem2>,
    Elem1: PartialEq<Elem2>,
{
    let mut ai = a.into_iter();
    let mut bi = b.into_iter();
    let mut distance = 0usize;
    loop {
        match (ai.next(), bi.next()) {
            (Some(x), Some(y)) => {
                if !x.eq(&y) {
                    distance += 1;
                }
            }
            (None, None) => return Ok(distance),
            _ => return Err(StrSimError::DifferentLengthArgs),
        }
    }
}

pub fn generic_jaro<'a, 'b, Iter1, Iter2, Elem1, Elem2>(a: &'a Iter1, b: &'b Iter2) -> f64
where
    &'a Iter1: IntoIterator<Item = Elem1>,
    &'b Iter2: IntoIterator<Item = Elem2>,
    Elem1: PartialEq<Elem2>,
{
    let a_len = a.into_iter().count();
    let b_len = b.into_iter().count();

    if a_len == 0 && b_len == 0 {
        return 1.0;
    } else if a_len == 0 || b_len == 0 {
        return 0.0;
    } else if a_len == 1 && b_len == 1 {
        let a_first = a.into_iter().next().unwrap();
        let b_first = b.into_iter().next().unwrap();
        return if a_first.eq(&b_first) { 1.0 } else { 0.0 };
    }

    let search_range = (std::cmp::max(a_len, b_len) / 2) - 1;

    let mut b_consumed = vec![false; b_len];
    let mut matches = 0.0;
    let mut transpositions = 0.0;
    let mut b_match_index = 0;

    for (i, a_elem) in a.into_iter().enumerate() {
        let min_bound = if i > search_range { i - search_range } else { 0 };
        let max_bound = std::cmp::min(b_len - 1, i + search_range);
        if min_bound > max_bound {
            continue;
        }
        for (j, b_elem) in b.into_iter().enumerate() {
            if min_bound <= j && j <= max_bound && a_elem.eq(&b_elem) && !b_consumed[j] {
                b_consumed[j] = true;
                matches += 1.0;
                if j < b_match_index {
                    transpositions += 1.0;
                }
                b_match_index = j;
                break;
            }
        }
    }

    if matches == 0.0 {
        0.0
    } else {
        (1.0 / 3.0)
            * ((matches / a_len as f64)
                + (matches / b_len as f64)
                + ((matches - transpositions) / matches))
    }
}
"""

HARNESS = r"""
// Scoring referee harness: drives the VERBATIM-compiled reference crate.
// argv: <provider simple|lossless> <algo exact|hamming|jaro> <threshold f32>
//       <word_count_limit usize> <distance usize>
// stdin lines:
//   D\t<name>\t<escaped content>     (\n, \t, \\ escapes)
//   R\t<name>                        (force-remove document)
//   Q\t<escaped query>
// output per query:
//   PERR | DERR | DOCS\tid,id,... then OERR | H\t<doc>\t<start>\t<bits>\t<wid>\t<s:w,...>
//   END
use elipdotter::index::{DocumentMap, Lossless, LosslessOccurrences, Simple, SimpleOccurences};
use elipdotter::proximity::Algorithm;
use elipdotter::query::Query;

fn unescape(s: &str) -> String {
    let mut out = String::with_capacity(s.len());
    let mut chars = s.chars();
    while let Some(c) = chars.next() {
        if c == '\\' {
            match chars.next() {
                Some('n') => out.push('\n'),
                Some('t') => out.push('\t'),
                Some('\\') => out.push('\\'),
                Some(other) => {
                    out.push('\\');
                    out.push(other);
                }
                None => out.push('\\'),
            }
        } else {
            out.push(c);
        }
    }
    out
}

enum Index {
    Simple(Simple),
    Lossless(Lossless),
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let provider = args[1].clone();
    let algo = match args[2].as_str() {
        "exact" => Algorithm::Exact,
        "hamming" => Algorithm::Hamming,
        "jaro" => Algorithm::Jaro,
        other => panic!("bad algo {}", other),
    };
    let threshold: f32 = args[3].parse().unwrap();
    let limit: usize = args[4].parse().unwrap();
    let distance: usize = args[5].parse().unwrap();

    let mut map = DocumentMap::new();
    let mut index = match provider.as_str() {
        "simple" => Index::Simple(Simple::new(threshold, algo, limit)),
        "lossless" => Index::Lossless(Lossless::new(threshold, algo, limit)),
        other => panic!("bad provider {}", other),
    };
    let mut contents: Vec<(String, String)> = Vec::new();

    use std::io::{BufRead, Write};
    let stdin = std::io::stdin();
    let stdout = std::io::stdout();
    let mut out = stdout.lock();

    for line in stdin.lock().lines() {
        let line = line.unwrap();
        let mut parts = line.splitn(3, '\t');
        match parts.next() {
            Some("D") => {
                let name = parts.next().unwrap().to_owned();
                let content = unescape(parts.next().unwrap_or(""));
                match &mut index {
                    Index::Simple(i) => map.insert(&name, &content, i),
                    Index::Lossless(i) => map.insert(&name, &content, i),
                }
                contents.retain(|(n, _)| *n != name);
                contents.push((name, content));
            }
            Some("R") => {
                let name = parts.next().unwrap();
                if let Some(id) = map.get_id(name) {
                    match &mut index {
                        Index::Simple(i) => map.force_remove(id, i),
                        Index::Lossless(i) => map.force_remove(id, i),
                    }
                    contents.retain(|(n, _)| n != name);
                }
            }
            Some("Q") => {
                let qs = unescape(parts.next().unwrap_or(""));
                let q: Result<Query, _> = qs.parse();
                let q = match q {
                    Ok(q) => q,
                    Err(_) => {
                        writeln!(out, "PERR").unwrap();
                        writeln!(out, "END").unwrap();
                        continue;
                    }
                };
                match &index {
                    Index::Simple(i) => {
                        let mut docs = q.documents(i);
                        let ids: Result<Vec<u64>, _> =
                            docs.iter().map(|it| it.map(|id| id.inner()).collect());
                        match ids {
                            Err(_) => {
                                writeln!(out, "DERR").unwrap();
                                writeln!(out, "END").unwrap();
                                continue;
                            }
                            Ok(ids) => {
                                let strs: Vec<String> =
                                    ids.iter().map(|i| i.to_string()).collect();
                                writeln!(out, "DOCS\t{}", strs.join(",")).unwrap();
                            }
                        }
                        let pm = docs.take_proximate_map();
                        let mut occ = SimpleOccurences::new(i, &pm);
                        for (name, content) in &contents {
                            occ.add_document(
                                map.get_id(name).unwrap(),
                                std::sync::Arc::new(content.clone()),
                            );
                        }
                        match q.occurrences(&occ, distance) {
                            Err(_) => writeln!(out, "OERR").unwrap(),
                            Ok(hits) => {
                                for h in hits {
                                    let occs: Vec<String> = h
                                        .occurrences()
                                        .map(|a| format!("{}:{}", a.start(), a.word_id()))
                                        .collect();
                                    writeln!(
                                        out,
                                        "H\t{}\t{}\t{:08x}\t{}\t{}",
                                        h.id().inner(),
                                        h.start(),
                                        h.rating().to_bits(),
                                        h.word_id(),
                                        occs.join(",")
                                    )
                                    .unwrap();
                                }
                            }
                        };
                    }
                    Index::Lossless(i) => {
                        let mut docs = q.documents(i);
                        let ids: Result<Vec<u64>, _> =
                            docs.iter().map(|it| it.map(|id| id.inner()).collect());
                        match ids {
                            Err(_) => {
                                writeln!(out, "DERR").unwrap();
                                writeln!(out, "END").unwrap();
                                continue;
                            }
                            Ok(ids) => {
                                let strs: Vec<String> =
                                    ids.iter().map(|i| i.to_string()).collect();
                                writeln!(out, "DOCS\t{}", strs.join(",")).unwrap();
                            }
                        }
                        let pm = docs.take_proximate_map();
                        let occ = LosslessOccurrences::new(i, &pm);
                        match q.occurrences(&occ, distance) {
                            Err(_) => writeln!(out, "OERR").unwrap(),
                            Ok(hits) => {
                                for h in hits {
                                    let occs: Vec<String> = h
                                        .occurrences()
                                        .map(|a| format!("{}:{}", a.start(), a.word_id()))
                                        .collect();
                                    writeln!(
                                        out,
                                        "H\t{}\t{}\t{:08x}\t{}\t{}",
                                        h.id().inner(),
                                        h.start(),
                                        h.rating().to_bits(),
                                        h.word_id(),
                                        occs.join(",")
                                    )
                                    .unwrap();
                                }
                            }
                        };
                    }
                }
                writeln!(out, "END").unwrap();
                out.flush().unwrap();
            }
            _ => {}
        }
    }
}
"""

# ----------------------------------------------------------- input spaces

VOCAB = [
    # clusters of similar words (fuzzy expansion), short words (the <3-byte
    # branch), hyphen compounds, unicode, op-keyword-adjacent words
    "lorem", "lorm", "loorem", "ipsum", "ipsun", "dolor", "dolores",
    "sit", "sat", "set", "am", "an", "a", "ab",
    "consectetur", "consectetu", "feugiat", "feugia",
    "luctus", "luctos", "sem", "semm", "web-server", "web", "server",
    "räksmörgås", "raksmorgas", "notx", "andy", "organ",
    "spam",
]
SEPARATORS = [" ", " ", " ", ". ", ", ", "\n", " - ", "! ", "? "]
QUERY_OPS = [" ", " ", " or ", " and ", " -", " !", " not "]


def gen_doc(rng: random.Random) -> str:
    n = rng.randint(1, 60)
    toks = []
    for _ in range(n):
        w = rng.choice(VOCAB)
        if rng.random() < 0.05:
            w = w.upper()
        toks.append(w)
    if rng.random() < 0.15:  # spam-shaped: one word repeated many times
        toks += [rng.choice(VOCAB)] * rng.randint(30, 120)
    if rng.random() < 0.04:  # LONG spam chain: pins the iterative
        # chain-merge rewrite against the reference's (Rust, stack-safe)
        # recursion at lengths where a recursive Python port would overflow
        toks += [rng.choice(VOCAB)] * rng.randint(500, 800)
    out = []
    for t in toks:
        out.append(t)
        out.append(rng.choice(SEPARATORS))
    return "".join(out)


def gen_query(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.03:  # operator keyword alone / degenerate input (PERR paths)
        return rng.choice(["not", "and", "or", "", " ", "()", "-", "!"])
    n = rng.randint(1, 4)
    parts = []
    for i in range(n):
        w = rng.choice(VOCAB)
        if rng.random() < 0.3:  # typo
            k = rng.randrange(len(w))
            w = w[:k] + rng.choice("abcdefgh") + w[k + 1:]
        if rng.random() < 0.15:
            w = "(" + w + ")"
        if rng.random() < 0.04:  # nested group
            w = "((" + w + "))"
        parts.append(w)
        if i < n - 1:
            parts.append(rng.choice(QUERY_OPS))
    q = "".join(parts)
    if rng.random() < 0.1:
        q = "(" + q + ")"
    if rng.random() < 0.08:  # leading NOT (stray-NOT DERR/OERR classes)
        q = rng.choice(["-", "!", "not "]) + q
    return q


CONFIGS = [
    # (provider, algo, threshold, word_count_limit, distance)
    ("simple", "exact", 0.85, 2500, 100),
    ("lossless", "exact", 0.85, 2500, 100),
    ("simple", "hamming", 0.85, 2500, 100),
    ("lossless", "hamming", 0.85, 2500, 100),
    ("simple", "jaro", 0.85, 2500, 100),
    ("lossless", "jaro", 0.85, 2500, 100),
    ("lossless", "hamming", 0.8, 1, 10),    # first-char pruning + tight merge
    ("simple", "jaro", 0.9, 1, 2),          # ditto, jaro, minimal distance
]


def esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")


def build(workdir: Path) -> Path:
    def rc(*args):
        subprocess.run(["rustc", "-O", "--edition", "2021", *args],
                       check=True, capture_output=True, text=True, cwd=workdir)

    (workdir / "iter_set.rs").write_text(ITER_SET_SHIM)
    (workdir / "strsim.rs").write_text(STRSIM_SHIM)
    (workdir / "main.rs").write_text(HARNESS)
    rc("--crate-type", "rlib", "iter_set.rs", "--crate-name", "iter_set",
       "-o", "libiter_set.rlib")
    rc("--crate-type", "rlib", "strsim.rs", "--crate-name", "strsim",
       "-o", "libstrsim.rlib")
    rc("--crate-type", "rlib", str(REF_LIB_RS), "--crate-name", "elipdotter",
       "--extern", "iter_set=libiter_set.rlib",
       "--extern", "strsim=libstrsim.rlib", "-L", ".",
       "-o", "libelipdotter.rlib")
    rc("main.rs", "--crate-name", "refscore",
       "--extern", "elipdotter=libelipdotter.rlib", "-L", ".",
       "-o", "refscore")
    return workdir / "refscore"


def run_ours(commands, provider, algo, threshold, limit, distance):
    import numpy as np
    from elipdotter_spark.core.oracle import (DocumentMap, Index, StrayNot,
                                              documents, query_hits)
    from elipdotter_spark.core.parser import ParseError, parse

    idx = Index(proximity_threshold=threshold, algo=algo,
                word_count_limit=limit)
    m = DocumentMap()
    contents = {}
    out = []
    for cmd in commands:
        if cmd[0] == "D":
            _, name, content = cmd
            i = m.insert(name, content, idx)
            contents[i] = content
        elif cmd[0] == "R":
            _, name = cmd
            i = m.get_id(name)
            if i is not None:
                m.force_remove(i, idx)
                contents.pop(i, None)
        else:
            _, qs = cmd
            try:
                part = parse(qs)
            except ParseError:
                out += ["PERR", "END"]
                continue
            try:
                ids = documents(part, idx)
            except StrayNot:
                out += ["DERR", "END"]
                continue
            out.append("DOCS\t" + ",".join(map(str, ids)))
            try:
                hits = query_hits(part, idx, distance, contents,
                                  provider=provider)
            except StrayNot:
                out += ["OERR", "END"]
                continue
            for h in hits:
                bits = int(np.float32(h.rating).view(np.uint32))
                occs = ",".join(f"{a.start}:{a.word_id}"
                                for a in h.iter_occurrences())
                out.append(
                    f"H\t{h.doc_id}\t{h.start}\t{bits:08x}\t{h.word_id}\t{occs}")
            out.append("END")
    return "\n".join(out)


def main() -> int:
    n_corpora = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    if shutil.which("rustc") is None or not REF_LIB_RS.exists():
        print(json.dumps({"skipped": "rustc or reference unavailable"}))
        return 0
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    stats = {"corpora": n_corpora, "configs": len(CONFIGS), "queries": 0,
             "mismatched_sessions": 0}
    examples = []
    with tempfile.TemporaryDirectory() as td:
        binary = build(Path(td))
        for ci in range(n_corpora):
            rng = random.Random(4000 + ci)
            commands = []
            for d in range(rng.randint(1, 7)):
                commands.append(("D", f"doc{d}", gen_doc(rng)))
            if rng.random() < 0.4 and len(commands) > 1:
                victim = rng.choice([c[1] for c in commands])
                commands.append(("R", victim))
                if rng.random() < 0.5:
                    commands.append(("D", f"re{ci}", gen_doc(rng)))
            nq = rng.randint(4, 10)
            for _ in range(nq):
                commands.append(("Q", gen_query(rng)))
            stats["queries"] += nq * len(CONFIGS)

            lines = []
            for cmd in commands:
                if cmd[0] == "D":
                    lines.append(f"D\t{cmd[1]}\t{esc(cmd[2])}")
                elif cmd[0] == "R":
                    lines.append(f"R\t{cmd[1]}")
                else:
                    lines.append(f"Q\t{esc(cmd[1])}")
            stdin = "\n".join(lines) + "\n"

            for cfg in CONFIGS:
                provider, algo, threshold, limit, distance = cfg
                r = subprocess.run(
                    [str(binary), provider, algo, str(threshold),
                     str(limit), str(distance)],
                    input=stdin, capture_output=True, text=True)
                ref_out = r.stdout.strip()
                our_out = run_ours(commands, provider, algo, threshold,
                                   limit, distance).strip()
                if ref_out != our_out:
                    stats["mismatched_sessions"] += 1
                    if len(examples) < 3:
                        # first differing line for the report
                        rl, ol = ref_out.splitlines(), our_out.splitlines()
                        diff_at = next(
                            (k for k in range(min(len(rl), len(ol)))
                             if rl[k] != ol[k]), min(len(rl), len(ol)))
                        examples.append({
                            "corpus": ci, "config": list(cfg),
                            "line": diff_at,
                            "ref": rl[diff_at] if diff_at < len(rl) else "<eof>",
                            "ours": ol[diff_at] if diff_at < len(ol) else "<eof>",
                        })

    stats["pass"] = stats["mismatched_sessions"] == 0
    if examples:
        stats["examples"] = examples
    print(json.dumps(stats))
    return 0 if stats["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
