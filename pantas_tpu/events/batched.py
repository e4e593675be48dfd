"""Batched junction-pattern matching on device (annotated exon skipping).

The host caller (:mod:`caller`) enumerates events with reference-exact
control flow. This module demonstrates the tensorized formulation of the
same pattern — the BASELINE.md "events/s as batched junction-pattern
matching" design — for the most regular family, annotated ES:

    for junction J and flanking junctions j1 (same head), j2 (same tail):
      ES iff  (T[j1] & T[j2]) \\ T[J]  is non-empty            (inclusion)
         and (E[j1.tail] | E[j2.head]) \\ (Ef[J.head] | Ef[J.tail]) non-empty
                                                                (new exons)

Transcript sets T and exon-label sets E become packed uint32 bitsets; the
candidate triples (cheap host grouping by endpoint) evaluate as three
gathers + bitwise ops + an any-reduce — one fused XLA kernel over all
candidates at once. Exactness is cross-validated against the host caller's
ES row set in tests (identical triples on every fixture).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

from pantas_tpu.events.caller import (
    CallOptions,
    Jct,
    SplicingGraph,
    _exon_label_th,
    _genes_of_hts,
)


def _bitset_matrix(sets: Sequence[Set[int]], vocab: int) -> np.ndarray:
    words = (vocab + 31) // 32
    out = np.zeros((len(sets), max(words, 1)), dtype=np.uint32)
    for i, s in enumerate(sets):
        for x in s:
            out[i, x >> 5] |= np.uint32(1 << (x & 31))
    return out


def find_annotated_es(
    graph: SplicingGraph,
    t2g: Dict[str, str],
    rca: int = -1,
) -> Set[Tuple[Jct, Jct, Jct]]:
    """All (J, j1, j2) annotated-ES triples, evaluated as device bitset ops."""
    import jax
    import jax.numpy as jnp

    junctions = sorted(graph.junctions)  # deterministic candidate order
    if not junctions:
        return set()

    # --- tokenize transcripts and exon labels ---------------------------
    t_vocab: Dict[str, int] = {}
    e_vocab: Dict[str, int] = {}

    def t_id(t: str) -> int:
        return t_vocab.setdefault(t, len(t_vocab))

    def e_id(e: str) -> int:
        return e_vocab.setdefault(e, len(e_vocab))

    j_index = {j: i for i, j in enumerate(junctions)}
    j_tsets: List[Set[int]] = []
    j_gene: List[object] = []
    for j in junctions:
        hts = graph.jn_hts(j)
        j_tsets.append({t_id(t) for t in hts})
        genes = _genes_of_hts(hts, t2g)
        j_gene.append(next(iter(genes)) if len(genes) == 1 else None)

    # raw exon-label bitsets for every node that flanks a junction
    nodes = sorted({n for j in junctions for n in j})
    n_index = {n: i for i, n in enumerate(nodes)}
    n_esets = [{e_id(e) for e in graph.exset(n)} for n in nodes]

    # --- host-side candidate enumeration (cheap endpoint grouping) ------
    cands: List[Tuple[int, int, int]] = []
    filt_sets: List[Set[int]] = []  # per-candidate gene-filtered (Ef row)
    filt_cache: Dict[Jct, Set[int]] = {}
    for J in junctions:
        ji = j_index[J]
        gene = j_gene[ji]
        if gene is None or graph.rc(J) < rca:
            continue
        Js1 = graph.j_by_head.get(J[0], graph._empty_j) - {J}
        Js2 = graph.j_by_tail.get(J[1], graph._empty_j) - {J}
        Js1 = {x for x in Js1 if gene in _genes_of_hts(graph.jn_hts(x), t2g)}
        Js2 = {x for x in Js2 if gene in _genes_of_hts(graph.jn_hts(x), t2g)}
        if not Js1 or not Js2:
            continue
        if J not in filt_cache:
            filt = {
                e_id(e)
                for n in J
                for e in graph.exset(n)
                if t2g[_exon_label_th(e)[0]] == gene
            }
            filt_cache[J] = filt
        for j1 in sorted(Js1):
            for j2 in sorted(Js2):
                cands.append((ji, j_index[j1], j_index[j2]))
                filt_sets.append(filt_cache[J])
    if not cands:
        return set()

    # --- device evaluation: gathers + bitwise ops + any-reduce ----------
    T = jnp.asarray(_bitset_matrix(j_tsets, len(t_vocab)))
    E = jnp.asarray(_bitset_matrix(n_esets, len(e_vocab)))
    Ef = jnp.asarray(_bitset_matrix(filt_sets, len(e_vocab)))

    c = np.asarray(cands, dtype=np.int32)
    jJ, j1, j2 = c[:, 0], c[:, 1], c[:, 2]
    j1_tail = np.asarray([n_index[junctions[i][1]] for i in j1], dtype=np.int32)
    j2_head = np.asarray([n_index[junctions[i][0]] for i in j2], dtype=np.int32)

    @jax.jit
    def match(T, E, Ef, jJ, j1, j2, j1_tail, j2_head):
        inclusion = (T[j1] & T[j2]) & ~T[jJ]
        has_inclusion = jnp.any(inclusion != 0, axis=1)
        new_exons = (E[j1_tail] | E[j2_head]) & ~Ef
        has_new = jnp.any(new_exons != 0, axis=1)
        return has_inclusion & has_new

    hits = np.asarray(
        match(
            T, E, Ef,
            jnp.asarray(jJ), jnp.asarray(j1), jnp.asarray(j2),
            jnp.asarray(j1_tail), jnp.asarray(j2_head),
        )
    )
    return {
        (junctions[a], junctions[b], junctions[cc])
        for (a, b, cc), hit in zip(cands, hits)
        if hit
    }


def host_es_triples(
    gfa_path: str, gtf_path: str, rca: int = -1
) -> Set[Tuple[Jct, Jct, Jct]]:
    """Reference-exact host caller's annotated-ES triples (for validation)."""
    from pantas_tpu.events.caller import call_events

    triples = set()
    opts = CallOptions(rca=rca, events=["ES"])
    for row in call_events(gfa_path, gtf_path, opts):
        cols = row.split(",")
        if cols[0] != "ES" or cols[1] != "annotated":
            continue
        j = tuple(cols[8].split(">"))
        j1 = tuple(cols[10].split(">"))
        j2 = tuple(cols[12].split(">"))
        triples.add((j, j1, j2))
    return triples
