"""Seeded randomized augment differential: random graphs + random GAF
records (arbitrary walks, offsets, and cs streams — the reference
tolerates early cs exhaustion, leftover ops, pure-indel node drops, and
novel-edge walks, so unconstrained random records are valid inputs)
through the reference augmenter vs our host, native, and device engines.
Byte-identical output required on every seed."""

import io
import random
import subprocess
import sys

from conftest import REFERENCE

from pantas_tpu.coverage import augment_gfa

REF_AUG = REFERENCE / "scripts" / "alignments_augmentation_from_gaf.py"


def make_graph(rng: random.Random):
    n = rng.randint(6, 14)
    lens = [rng.randint(1, 12) for _ in range(n)]
    edges = {(i, i + 1) for i in range(n - 1)}
    for _ in range(n):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    lines = ["H\tVN:Z:1.1"]
    for i, L in enumerate(lens):
        seq = "".join(rng.choice("ACGT") for _ in range(L))
        ex = f"\tEX:Z:T1_R1.{1 + i // 3}" if rng.random() < 0.7 else ""
        lines.append(f"S\t{i + 1}\t{seq}{ex}")
    for a, b in sorted(edges):
        jn = f"\tJN:Z:T1_R1.{1 + a // 3}.{1 + b // 3}" if rng.random() < 0.3 else ""
        lines.append(f"L\t{a + 1}\t+\t{b + 1}\t+\t*{jn}")
    lines.append("P\tT1_R1\t" + ",".join(f"{i + 1}+" for i in range(n)) + "\t*")
    return "\n".join(lines) + "\n", lens


def make_gaf(rng: random.Random, lens, n_reads: int) -> str:
    n = len(lens)
    recs = []
    for r in range(n_reads):
        walk = [rng.randrange(n)]
        for _ in range(rng.randint(0, 4)):
            walk.append(rng.randrange(n))
        arrow = "<" if rng.random() < 0.25 else ">"
        pathstr = "".join(arrow + str(i + 1) for i in walk)
        plen = sum(lens[i] for i in walk)
        pstart = rng.randrange(0, min(lens[walk[0]], plen))
        pend = rng.randint(pstart + 1, plen)
        span = pend - pstart
        # The reference walks EVERY node demanding its full length (only
        # the literal first/last get start/end adjustments — middle nodes
        # past pend still demand full lengths), tolerates cs exhaustion
        # only inside the final node, and CRASHES on earlier under-supply
        # (IndexError, alignments_augmentation_from_gaf.py:227). Supply
        # the exact demand (+ random leftover, which IS tolerated). Its
        # node walk also collapses consecutive duplicates (:185-189).
        dedup = [walk[0]]
        for i in walk[1:]:
            if i != dedup[-1]:
                dedup.append(i)
        demand = sum(lens[i] for i in dedup) - pstart
        last_eff = lens[dedup[-1]] - (plen - pend) + 1
        demand -= lens[dedup[-1]] - max(0, last_eff)
        ops = []
        remaining = demand + rng.randint(0, 3)
        while remaining > 0:
            t = rng.random()
            if t < 0.6:
                step = rng.randint(1, remaining)
                ops.append(f":{step}")
                remaining -= step
            elif t < 0.75:
                ops.append("*" + rng.choice("acgt") + rng.choice("acgt"))
                remaining -= 1
            elif t < 0.88:
                ops.append("+" + "".join(
                    rng.choice("acgt") for _ in range(rng.randint(1, 3))
                ))
            else:
                d = "".join(rng.choice("acgt") for _ in range(rng.randint(1, 3)))
                ops.append("-" + d)
                remaining -= len(d)
        if len(ops) == 2:
            # exactly-2-op streams trigger the reference's clipping rule,
            # which can shrink supply below the pre-last-node demand (its
            # exhaustion guard only covers the final node) — pad to 3 ops
            ops.append(":1")
        cs = "".join(ops) or ":1"
        qlen = span
        mapq = 60 if rng.random() < 0.9 else rng.randint(0, 19)
        dv = "0.0" if rng.random() < 0.9 else "0.2"
        recs.append(
            f"r{r}\t{qlen}\t0\t{qlen}\t+\t{pathstr}\t{plen}\t{pstart}\t"
            f"{pend}\t{span}\t{qlen}\t{mapq}\tcs:Z:{cs}\tdv:f:{dv}"
        )
    return "\n".join(recs) + "\n"


def _reference(gaf, gfa) -> str:
    proc = subprocess.run(
        [sys.executable, str(REF_AUG), str(gaf), str(gfa)],
        capture_output=True, text=True, check=True,
    )
    return proc.stdout


def _ours_host(gaf, gfa) -> str:
    buf, log = io.StringIO(), io.StringIO()
    augment_gfa(str(gaf), str(gfa), out=buf, log=log)
    return buf.getvalue()


def test_fuzz_host_matches_reference(tmp_path):
    for seed in range(6):
        rng = random.Random(seed)
        gfa_text, lens = make_graph(rng)
        gfa = tmp_path / f"g{seed}.gfa"
        gaf = tmp_path / f"g{seed}.gaf"
        gfa.write_text(gfa_text)
        gaf.write_text(make_gaf(rng, lens, 40))
        expected = _reference(gaf, gfa)
        assert _ours_host(gaf, gfa) == expected, f"seed {seed}"


def test_fuzz_native_and_device_match_reference(tmp_path):
    from pantas_tpu.coverage.device import augment_gfa_device
    from pantas_tpu.native import augment_gfa_native

    for seed in (0, 7):
        rng = random.Random(seed)
        gfa_text, lens = make_graph(rng)
        gfa = tmp_path / f"n{seed}.gfa"
        gaf = tmp_path / f"n{seed}.gaf"
        gfa.write_text(gfa_text)
        gaf.write_text(make_gaf(rng, lens, 40))
        expected = _reference(gaf, gfa)

        buf, log = io.StringIO(), io.StringIO()
        augment_gfa_native(str(gaf), str(gfa), out=buf, log=log)
        assert buf.getvalue() == expected, f"native seed {seed}"

        buf, log = io.StringIO(), io.StringIO()
        augment_gfa_device(str(gaf), str(gfa), out=buf, log=log)
        assert buf.getvalue() == expected, f"device seed {seed}"
