"""Streaming CEP: sequence-pattern matching over an unbounded
micro-batch stream with event-time watermarks and cross-epoch partial-
match state.

The north-star brief calls the engine a "structured-streaming / CEP
engine"; ``ops/cep.py`` is the bounded matcher (one shuffle, whole
partition in memory) — this is the continuous counterpart: rows arrive
in epoch micro-batches with intra-epoch disorder, are buffered per
partition until the watermark passes them, and are then fed to an
INCREMENTAL matcher whose open attempts ("partials") survive across
epochs. Emitted matches equal the bounded operator's output for the
same input whenever no row is late (pytest pins this equivalence on
random streams for both contiguity modes; the driver gate bit-checks
the funnel against the bounded SQL oracle).

Semantics (identical to ``ops.cep.match_pattern``):

* rows of one key ordered by ``(order_by, tiebreak)``; a match attempt
  starts at every step-1 row (per-start emission);
* ``contiguity="skip"`` (skip-till-next-match): step k+1 binds the
  FIRST later row of the key satisfying it — an attempt therefore
  never dies, it just stays open (bounded by ``within`` expiry);
* ``contiguity="strict"``: step k+1 must hold on the IMMEDIATELY next
  row of the key; an attempt whose next row mismatches dies. A partial
  whose bound row is the key's last row seen so far survives — the
  adjacent row simply hasn't arrived yet;
* ``within``: time(last step) − time(start) ≤ within. Partials whose
  horizon the watermark has passed are expired (counted, never silent).

Streaming mechanics (same conventions as ``StreamingJob`` /
``StreamingDedupJob``):

* prep tasks prune columns at the read, hash-partition by the pattern
  keys, and return P per-partition slices (``num_returns=P``
  point-to-point routing);
* each ``CEPStateActor`` buffers rows newer than the watermark and, per
  epoch, flushes the band ``(flushed_upto, W]`` against the epoch-START
  watermark (epoch-barrier: intra-epoch disorder never drops);
  a row at or below ``flushed_upto`` is a LATE drop (counted);
* the flush feeds the incremental matcher: one ``np.lexsort`` + the
  bounded operator's vectorized per-step searchsorted chain, seeded
  with the carried partials (grouped into per-entry-step cohorts — at
  most K of them, each fully vectorized);
* completed matches go to the idempotent two-phase sink as one
  (partition, epoch) file; checkpoints snapshot buffer + partials +
  watermark so a killed job resumes bit-equal.

Partitioning assumption (custom-operator mandate): correctness needs
only that equal keys co-locate — guaranteed by the hash shuffle at any
cluster size. Patterns are key-local, so hot keys cannot be salted;
state per key is O(open attempts), bounded by ``within``.
"""

from __future__ import annotations

import pickle
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..expr import Expr
from ..ops.asof import _as_i8
from ..ops.cep import _mask_of
from .driver import _split_by_part, limit_worker_threads
from .sink import TwoPhaseSink

_NEG_INF = -(1 << 62)


def _joint_codes(tbls: list[pa.Table], key_cols: list[str]) -> np.ndarray:
    """Mixed-radix joint key codes over the CONCATENATED tables (so
    codes are comparable across them)."""
    n = sum(t.num_rows for t in tbls)
    gid = np.zeros(n, dtype=np.int64)
    if n == 0:
        return gid
    allt = tbls[0] if len(tbls) == 1 else pa.concat_tables(
        [t.select(key_cols) for t in tbls], promote_options="permissive")
    for k in key_cols:
        col = allt.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = col.dictionary_encode().indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gid = gid * (int(codes.max()) + 2) + codes + 1
    return gid


class _CEPPartitionState:
    """One partition's buffer + open-attempt store + matcher. Pure
    Python/numpy/Arrow — unit-testable without Ray."""

    def __init__(self, spec: dict):
        from ..ops.cep import _parse_steps

        self.keys: list[str] = list(spec["partition_by"])
        self.order_by: str = spec["order_by"]
        self.tiebreak: str | None = spec.get("tiebreak")
        self.contiguity: str = spec.get("contiguity", "skip")
        # steps may carry {m,n} quantifiers (round 5; strict-only —
        # same rule and semantics as the bounded matcher)
        self.steps, self.quants = _parse_steps(
            list(spec["steps"]), self.contiguity)
        self.within: int | None = spec.get("within")
        self.measures: list[str] = list(spec.get("measures") or [])
        self.lateness_us: int = int(spec.get("lateness_us", 0))
        self.in_schema: pa.Schema = spec["in_schema"]
        self.names = [n for n, _ in self.steps]
        self.preds = [p for _, p in self.steps]
        self.K = len(self.steps)
        # negations: (step_a index, step_b index, predicate) — no row
        # matching the predicate strictly between the bound rows of a, b
        self.absent: list[tuple] = [
            (self.names.index(na), self.names.index(nb), pred)
            for na, nb, pred in (spec.get("absent") or [])]
        self.J = len(self.absent)
        self.watermark: int = _NEG_INF
        self.flushed_upto: int = _NEG_INF
        self.buffer: list[pa.Table] = []
        self.partials: pa.Table = self._partials_schema().empty_table()
        self.rows_in = 0
        self.matches_out = 0
        self.late_drops = 0
        self.expired_partials = 0

    # -- schemas ----------------------------------------------------------
    def _step_cols(self, name: str) -> list[pa.Field]:
        fs = [pa.field(f"{name}_{self.order_by}",
                       self.in_schema.field(self.order_by).type)]
        for m in self.measures:
            fs.append(pa.field(f"{name}_{m}", self.in_schema.field(m).type))
        if self.quants[self.names.index(name)] is not None:
            fs.append(pa.field(f"{name}_n", pa.int64()))
        return fs

    def out_schema(self) -> pa.Schema:
        fields = [self.in_schema.field(k) for k in self.keys]
        for name in self.names:
            fields.extend(self._step_cols(name))
        return pa.schema(fields)

    def _partials_schema(self) -> pa.Schema:
        # __rep: repetitions bound so far for the step the attempt is
        # waiting at (0 = step not started); __last_t: event time of the
        # attempt's LAST bound row (the `within` anchor for quantified
        # final steps whose last bind precedes the completing flush)
        extra = [pa.field("__step", pa.int64()),
                 pa.field("__start_t", pa.int64()),
                 pa.field("__rep", pa.int64()),
                 pa.field("__last_t", pa.int64())]
        extra += [pa.field(f"__neg{j}", pa.bool_()) for j in range(self.J)]
        return pa.schema(list(self.out_schema()) + extra)

    # -- ingest -----------------------------------------------------------
    def add(self, tbl: pa.Table) -> None:
        """Buffer one epoch slice; rows at or below the already-flushed
        boundary are late (their band was processed)."""
        self.rows_in += tbl.num_rows
        t, t_ok = _as_i8(tbl.column(self.order_by))
        late = (t <= self.flushed_upto) & t_ok
        # null order_by rows can never bind a step (bounded rule: t_ok
        # masks them out) — drop them here, counted as late
        drop = late | ~t_ok
        if drop.any():
            self.late_drops += int(drop.sum())
            tbl = tbl.filter(pa.array(~drop))
        if tbl.num_rows:
            self.buffer.append(tbl)

    def advance(self, epoch_max_t: int | None) -> None:
        if epoch_max_t is not None:
            self.watermark = max(self.watermark,
                                 int(epoch_max_t) - self.lateness_us)

    # -- the flush --------------------------------------------------------
    def flush(self, upto: int | None = None) -> pa.Table:
        """Process the buffered band ``(flushed_upto, W]`` (W = current
        watermark, or ``upto`` for the end-of-stream flush) through the
        incremental matcher; return completed matches."""
        W = self.watermark if upto is None else upto
        out_schema = self.out_schema()
        if W <= self.flushed_upto:
            return out_schema.empty_table()
        buf = (pa.concat_tables(self.buffer, promote_options="permissive")
               if self.buffer else None)
        F = None
        if buf is not None and buf.num_rows:
            t, _ = _as_i8(buf.column(self.order_by))
            m = t <= W
            F = buf.filter(pa.array(m))
            rest = buf.filter(pa.array(~m))
            self.buffer = [rest] if rest.num_rows else []
        self.flushed_upto = W
        if F is None or F.num_rows == 0:
            self._expire(W)
            return out_schema.empty_table()
        # upto is only passed by the end-of-stream flush: open
        # quantified runs at the final step may then complete by
        # exhaustion (the bounded matcher's "run ends at key end")
        out = self._match(F, final=upto is not None)
        # expire AFTER matching: this band's rows may complete a partial
        # right at its horizon
        self._expire(W)
        return out

    def _expire(self, W: int) -> None:
        if self.within is None or self.partials.num_rows == 0:
            return
        start = self.partials.column("__start_t").to_numpy(
            zero_copy_only=False)
        dead = start + int(self.within) <= W
        if dead.any():
            self.expired_partials += int(dead.sum())
            self.partials = self.partials.filter(pa.array(~dead))

    # -- matcher core ------------------------------------------------------
    def _match(self, F: pa.Table, final: bool = False) -> pa.Table:
        K = self.K
        pt = self.partials
        gid_all = _joint_codes([F, pt], self.keys)
        nF = F.num_rows
        gidF, gidP = gid_all[:nF], gid_all[nF:]
        t, t_ok = _as_i8(F.column(self.order_by))
        if self.tiebreak:
            tb, _ = _as_i8(F.column(self.tiebreak))
            order = np.lexsort((tb, t, gidF))
        else:
            order = np.lexsort((t, gidF))
        F = F.take(pa.array(order))
        gidF, t = gidF[order], t[order]
        masks = [(_mask_of(p, F) & True) for p in self.preds]
        pks = [np.flatnonzero(m) for m in masks]
        nposs = [np.flatnonzero(_mask_of(p, F)) for _, _, p in self.absent]

        matches: list[dict] = []
        new_partials: list[dict] = []

        def run_cohort(src: str, rows: np.ndarray, cur: np.ndarray,
                       gids: np.ndarray, s0: int, start_t: np.ndarray,
                       bound0: list[np.ndarray], negs0: np.ndarray,
                       rep0: np.ndarray, first_in_place: bool,
                       last_t0: np.ndarray):
            """Chain steps s0..K-1 for one cohort. ``rows`` indexes the
            partials table (src='old') or is the step-0 F position
            (src='new'); ``bound0`` = first-bind F positions already
            recorded IN THIS FLUSH (aligned with rows); ``negs0`` =
            carried negation flags. ``rep0``: repetitions already bound
            for step s0 (all zero, or all >= 1 with ``first_in_place``
            meaning step s0's first-bind columns are already recorded —
            in bound0 for src='new', in the old partial row for
            src='old'). ``last_t0``: event time of each attempt's last
            bound row so far."""
            alive = np.arange(len(rows))
            bound = [b.copy() for b in bound0]
            cur = cur.copy()
            negs = negs0.copy()
            rep = rep0.astype(np.int64).copy()
            last_t = last_t0.astype(np.int64).copy()
            done: dict[int, np.ndarray] = {}

            def nvals_at(mask) -> dict:
                return {f"{self.names[s]}_n": a[mask]
                        for s, a in done.items()}

            for k in range(s0, K):
                if len(alive) == 0:
                    return
                quant = self.quants[k]
                m_k, n_k = quant or (1, 1)
                carried_step = (k == s0 and first_in_place)
                if not carried_step:
                    rep = np.zeros(len(alive), dtype=np.int64)
                if self.contiguity == "skip":
                    pk = pks[k]
                    if len(pk):
                        j = np.searchsorted(pk, cur, side="right")
                        has = j < len(pk)
                        nxt = pk[np.minimum(j, len(pk) - 1)]
                        ok = has & (gidF[nxt] == gids)
                    else:
                        nxt = cur
                        ok = np.zeros(len(cur), dtype=bool)
                    # not-ok attempts stay open at step k: the next
                    # candidate simply hasn't arrived yet
                    stay = ~ok
                    if stay.any():
                        new_partials.append(self._partial_rows(
                            src, rows[alive[stay]], k, k,
                            start_t[alive[stay]],
                            [b[stay] for b in bound], F,
                            self._accum_wait(negs[stay], k, cur[stay],
                                             gids[stay], gidF, nposs),
                            np.zeros(int(stay.sum()), dtype=np.int64),
                            last_t[stay], nvals_at(stay)))
                    prev = cur[ok]
                    alive, cur = alive[ok], nxt[ok]
                    negs = self._accum_bind(negs[ok], k, prev, cur, nposs)
                    bound = [b[ok] for b in bound] + [cur]
                    gids, last_t = gids[ok], t[cur]
                    rep = np.ones(len(alive), dtype=np.int64)
                    done = {s: a[ok] for s, a in done.items()}
                else:  # strict — inner loop binds the {m,n} run
                    first_this = np.full(len(alive), -1, dtype=np.int64)
                    parked = np.zeros(len(alive), dtype=bool)
                    while True:
                        if n_k is not None:
                            parked |= rep >= n_k  # cap: run complete
                        act = np.flatnonzero(~parked)
                        if len(act) == 0:
                            break
                        nxt = cur[act] + 1
                        inb = nxt < nF
                        same = inb.copy()
                        same[inb] = gidF[nxt[inb]] == gids[act][inb]
                        hit = same.copy()
                        hit[same] = masks[k][nxt[same]]
                        staym = ~same
                        finm = same & ~hit & (rep[act] >= m_k)
                        diem = same & ~hit & (rep[act] < m_k)
                        if final:
                            # end-of-stream: no successor row will ever
                            # arrive — a run that already has >= m reps
                            # completes by exhaustion (bounded matcher's
                            # "run ends at key end"); the rest can never
                            # complete and is dropped
                            diem |= staym & (rep[act] < m_k)
                            finm |= staym & (rep[act] >= m_k)
                            staym[:] = False
                        if staym.any():
                            sidx = act[staym]
                            rz = rep[sidx] == 0
                            for mzero in (True, False):
                                which = rz if mzero else ~rz
                                if not which.any():
                                    continue
                                ss = sidx[which]
                                bnd = [b[ss] for b in bound]
                                upto = k
                                nv = nvals_at(ss)
                                if not mzero:
                                    upto = k + 1
                                    if not carried_step:
                                        bnd = bnd + [first_this[ss]]
                                    nv[f"{self.names[k]}_n"] = rep[ss]
                                new_partials.append(self._partial_rows(
                                    src, rows[alive[ss]], k, upto,
                                    start_t[alive[ss]], bnd, F,
                                    self._accum_wait(
                                        negs[ss], k, cur[ss],
                                        gids[ss], gidF, nposs),
                                    rep[ss], last_t[ss], nv))
                        bidx = act[hit]
                        if len(bidx):
                            nxtb = cur[bidx] + 1
                            negs[bidx] = self._accum_bind(
                                negs[bidx], k, cur[bidx], nxtb, nposs)
                            newf = rep[bidx] == 0
                            first_this[bidx[newf]] = nxtb[newf]
                            cur[bidx] = nxtb
                            rep[bidx] += 1
                            last_t[bidx] = t[nxtb]
                        parked[act[finm]] = True
                        drop = act[staym | diem]
                        if len(drop):
                            keepm = np.ones(len(cur), dtype=bool)
                            keepm[drop] = False
                            alive, cur, gids = (alive[keepm], cur[keepm],
                                                gids[keepm])
                            negs, rep = negs[keepm], rep[keepm]
                            last_t = last_t[keepm]
                            parked = parked[keepm]
                            first_this = first_this[keepm]
                            bound = [b[keepm] for b in bound]
                            done = {s: a[keepm]
                                    for s, a in done.items()}
                    if len(alive) == 0:
                        return
                    if quant is not None:
                        done[k] = rep.copy()
                    if not carried_step:
                        bound = bound + [first_this]
                if self.J and len(alive):
                    dead = np.zeros(len(alive), dtype=bool)
                    for jn, (ia, ib, _p) in enumerate(self.absent):
                        if ib == k:
                            dead |= negs[:, jn]
                    if dead.any():
                        keepm = ~dead
                        alive, cur, gids = alive[keepm], cur[keepm], gids[keepm]
                        negs, rep, last_t = (negs[keepm], rep[keepm],
                                             last_t[keepm])
                        bound = [b[keepm] for b in bound]
                        done = {s: a[keepm] for s, a in done.items()}
            if len(alive) == 0:
                return
            ok = np.ones(len(alive), dtype=bool)
            if self.within is not None:
                ok = (last_t - start_t[alive]) <= int(self.within)
            if ok.any():
                matches.append(self._match_rows(
                    src, rows[alive[ok]], [b[ok] for b in bound], F,
                    nvals_at(ok)))

        # cohort 0: attempts starting in this flush. Strict enters at
        # s0=0 with rep0=1 (the start row is step 0's first bind; the
        # cap/terminator logic then extends a quantified step 0 or
        # moves straight on). Skip — quantifier-free — enters at s0=1
        # as before (its branch has no cap guard against re-binding).
        starts = pks[0]
        if len(starts):
            if self.contiguity == "strict":
                run_cohort("new", starts, starts.copy(), gidF[starts], 0,
                           t[starts], [starts.copy()],
                           np.zeros((len(starts), self.J), dtype=bool),
                           np.ones(len(starts), dtype=np.int64), True,
                           t[starts])
            else:
                run_cohort("new", starts, starts.copy(), gidF[starts], 1,
                           t[starts], [starts.copy()],
                           np.zeros((len(starts), self.J), dtype=bool),
                           np.zeros(len(starts), dtype=np.int64), False,
                           t[starts])
        # carried partials whose key has rows in F, grouped into
        # per-(entry-step, mid-run?) cohorts
        if pt.num_rows:
            steps_arr = pt.column("__step").to_numpy(zero_copy_only=False)
            startP = pt.column("__start_t").to_numpy(zero_copy_only=False)
            repP = self._pt_i64(pt, "__rep")
            lastP = self._pt_i64(pt, "__last_t", default=startP)
            lo = np.searchsorted(gidF, gidP, side="left")
            hi = np.searchsorted(gidF, gidP, side="right")
            active = lo < hi
            idle = np.flatnonzero(~active)
            if len(idle):
                # keys absent from this flush: carry unchanged (at the
                # final flush, a mid-run attempt at the last step with
                # >= m reps completes by exhaustion instead)
                if final:
                    fin = idle[(steps_arr[idle] == K - 1)
                               & (repP[idle] >= np.int64(
                                   (self.quants[K - 1] or (1, 1))[0]))]
                    if len(fin):
                        ok = np.ones(len(fin), dtype=bool)
                        if self.within is not None:
                            ok = (lastP[fin] - startP[fin]) <= int(
                                self.within)
                        fin = fin[ok]
                    if len(fin):
                        nv = ({f"{self.names[K-1]}_n": repP[fin]}
                              if self.quants[K - 1] is not None else {})
                        matches.append(self._cols_for_steps(
                            "old", fin, K, [], F, pt, nv))
                    keepi = np.setdiff1d(idle, fin,
                                         assume_unique=True) \
                        if len(fin) else idle
                    if len(keepi):
                        new_partials.append(
                            {"__take_old": keepi, "__step": None})
                else:
                    new_partials.append(
                        {"__take_old": idle, "__step": None})
            negP = (np.stack([pt.column(f"__neg{j}").to_numpy(
                        zero_copy_only=False) for j in range(self.J)],
                        axis=1)
                    if self.J else np.zeros((pt.num_rows, 0), dtype=bool))
            for s in range(0, K):
                for midrun in (False, True):
                    sel = np.flatnonzero(active & (steps_arr == s)
                                         & ((repP > 0) == midrun))
                    if len(sel) == 0:
                        continue
                    run_cohort("old", sel, lo[sel] - 1, gidP[sel], s,
                               startP[sel], [], negP[sel],
                               repP[sel], midrun, lastP[sel])
        self.partials = self._assemble_partials(new_partials, pt)
        out = self._assemble(matches, self.out_schema())
        self.matches_out += out.num_rows
        return out

    @staticmethod
    def _pt_i64(pt: pa.Table, col: str, default=None) -> np.ndarray:
        """Read an int64 partials column; absent (pre-round-5
        checkpoint) -> zeros or the given default array."""
        if col in pt.column_names:
            return pt.column(col).to_numpy(zero_copy_only=False)
        if default is not None:
            return np.asarray(default, dtype=np.int64).copy()
        return np.zeros(pt.num_rows, dtype=np.int64)

    # -- row assembly -------------------------------------------------------
    def _cols_for_steps(self, src: str, rows: np.ndarray, upto: int,
                        bound: list[np.ndarray], F: pa.Table,
                        old: pa.Table, nvals: dict | None = None) -> dict:
        """Output columns for steps [0, upto): earlier steps come from the
        old partial row (src='old'), newly bound ones from F. ``nvals``
        overrides quantifier-count columns (``<step>_n``) with the
        current/final repetition counts for steps active this flush."""
        cols: dict[str, pa.Array] = {}
        n_new = len(bound)
        s0 = upto - n_new  # steps 0..s0-1 are carried, s0..upto-1 new
        take_old = pa.array(rows) if src == "old" else None
        if src == "old":
            for k in self.keys:
                cols[k] = old.column(k).take(take_old)
        else:
            f_take = pa.array(bound[0])
            for k in self.keys:
                cols[k] = F.column(k).take(f_take)
        for i, name in enumerate(self.names):
            for f in self._step_cols(name):
                src_col = f.name[len(name) + 1:]
                if i < s0:
                    cols[f.name] = (old.column(f.name).take(take_old)
                                    if src == "old" else None)
                elif i < upto:
                    if src_col == "n" and self.quants[i] is not None:
                        cols[f.name] = None  # filled from nvals below
                    else:
                        cols[f.name] = F.column(src_col).take(
                            pa.array(bound[i - s0])).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(len(rows), f.type)
        for fname, vals in (nvals or {}).items():
            cols[fname] = pa.array(np.asarray(vals, dtype=np.int64),
                                   type=pa.int64())
        return cols

    def _match_rows(self, src, rows, bound, F, nvals=None) -> dict:
        return self._cols_for_steps(src, rows, self.K, bound, F,
                                    self.partials, nvals)

    def _partial_rows(self, src, rows, step, upto, start_t, bound, F,
                      negs, rep, last_t, nvals=None) -> dict:
        cols = self._cols_for_steps(src, rows, upto, bound, F,
                                    self.partials, nvals)
        cols["__step"] = pa.array(np.full(len(rows), step, dtype=np.int64))
        cols["__start_t"] = pa.array(start_t.astype(np.int64))
        cols["__rep"] = pa.array(np.asarray(rep, dtype=np.int64))
        cols["__last_t"] = pa.array(np.asarray(last_t, dtype=np.int64))
        for j in range(self.J):
            cols[f"__neg{j}"] = pa.array(negs[:, j])
        return cols

    def _accum_bind(self, negs, k, prev, nxt, nposs):
        """Accumulate flags for attempts binding step k: negated rows in
        (prev, nxt] — the bound row itself is strictly between a and b
        when it is an INTERMEDIATE step (k < ib), excluded when it IS
        the b row (k == ib)."""
        for j, (ia, ib, _p) in enumerate(self.absent):
            if not (ia < k <= ib):
                continue
            npos = nposs[j]
            if not len(npos) or not len(prev):
                continue
            lo = np.searchsorted(npos, prev, side="right")
            hi = np.searchsorted(npos, nxt,
                                 side="left" if k == ib else "right")
            negs[:, j] |= hi > lo
        return negs

    def _accum_wait(self, negs, k, cur, gids, gidF, nposs):
        """Accumulate flags for attempts left waiting at step k: any
        negated row of the key after the last bound position in this
        flush falls inside the still-open (a, b) window."""
        if not self.J or not len(cur):
            return negs
        negs = negs.copy()
        block_hi = np.searchsorted(gidF, gids, side="right")
        for j, (ia, ib, _p) in enumerate(self.absent):
            if not (ia < k <= ib):
                continue
            npos = nposs[j]
            if not len(npos):
                continue
            lo = np.searchsorted(npos, cur, side="right")
            hi = np.searchsorted(npos, block_hi, side="left")
            negs[:, j] |= hi > lo
        return negs

    def _assemble(self, parts: list[dict], schema: pa.Schema) -> pa.Table:
        tbls = []
        for p in parts:
            arrs = [p[f.name] if p[f.name] is not None
                    else pa.nulls(0, f.type) for f in schema]
            tbls.append(pa.table(dict(zip(schema.names, arrs))).cast(schema))
        if not tbls:
            return schema.empty_table()
        return pa.concat_tables(tbls, promote_options="permissive")

    def _assemble_partials(self, parts: list[dict],
                           old: pa.Table) -> pa.Table:
        schema = self._partials_schema()
        tbls = []
        for p in parts:
            if "__take_old" in p:
                tbls.append(old.take(pa.array(p["__take_old"])))
            else:
                tbls.append(self._assemble([p], schema))
        if not tbls:
            return schema.empty_table()
        return pa.concat_tables(tbls, promote_options="permissive")

    # -- checkpointing ------------------------------------------------------
    def snapshot(self) -> bytes:
        def ser(tbl: pa.Table) -> bytes:
            import io

            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, tbl.schema) as w:
                w.write_table(tbl)
            return buf.getvalue()

        buf = (pa.concat_tables(self.buffer, promote_options="permissive")
               if self.buffer else self.in_schema.empty_table())
        return pickle.dumps({
            "buffer": ser(buf), "partials": ser(self.partials),
            "watermark": self.watermark, "flushed_upto": self.flushed_upto,
            "rows_in": self.rows_in, "matches_out": self.matches_out,
            "late_drops": self.late_drops,
            "expired_partials": self.expired_partials,
        })

    def restore(self, blob: bytes) -> None:
        doc = pickle.loads(blob)

        def de(b: bytes) -> pa.Table:
            with pa.ipc.open_stream(b) as r:
                return r.read_all()

        buf = de(doc["buffer"])
        self.buffer = [buf] if buf.num_rows else []
        self.partials = de(doc["partials"])
        self.watermark = doc["watermark"]
        self.flushed_upto = doc["flushed_upto"]
        # counters stay process-local (a resumed run reports ITS work;
        # the pre-crash epochs' output is already committed in the sink)
        self.rows_in = 0
        self.matches_out = 0
        self.late_drops = 0
        self.expired_partials = 0

    def metrics(self) -> dict:
        return {"rows_in": self.rows_in, "matches_out": self.matches_out,
                "late_drops": self.late_drops,
                "expired_partials": self.expired_partials,
                "open_partials": self.partials.num_rows,
                "buffered_rows": sum(b.num_rows for b in self.buffer),
                "watermark": self.watermark}


@ray.remote
def _cep_prep(inputs, columns, keys, num_partitions, order_by):
    """Read -> hash-partition one epoch's files; returns P slices plus a
    trailing scalar: the epoch's max event time (drives the watermark)."""
    limit_worker_threads()
    from ..exec.groupby import hash_partition_ids

    tables = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        batch = batch.replace_schema_metadata(None)
        part = hash_partition_ids(batch, keys, num_partitions)
        tables.append(batch.append_column(
            "__part", pa.array(part, type=pa.int64())))
    out = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="permissive")
    mx = None
    if out.num_rows:
        tvals, t_ok = _as_i8(out.column(order_by))
        if t_ok.any():
            mx = int(tvals[t_ok].max())
    slices = _split_by_part(out, num_partitions)
    return (*slices, mx) if num_partitions > 1 else (slices[0], mx)


@ray.remote
class CEPStateActor:
    def __init__(self, part_id: int, sink_dir: str, spec: dict):
        limit_worker_threads()
        self.part_id = part_id
        self.sink = TwoPhaseSink(sink_dir)
        self.state = _CEPPartitionState(spec)

    def process(self, epoch: int, n_preps: int, *maxes_then_parts) -> dict:
        # maxes and slices ride as TOP-LEVEL args so Ray resolves them
        # before scheduling (a ray.get inside an actor method makes the
        # raylet spawn extra workers — recorded perf lesson #3)
        maxes = maxes_then_parts[:n_preps]
        parts = maxes_then_parts[n_preps:]
        for p in parts:
            if p is not None and p.num_rows:
                self.state.add(p.drop_columns(["__part"]))
        # epoch barrier: flush against the epoch-START watermark, then
        # advance once from this epoch's max event time
        out = self.state.flush()
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        mxs = [m for m in maxes if m is not None]
        self.state.advance(max(mxs) if mxs else None)
        return self.state.metrics()

    def flush_all(self, epoch: int) -> dict:
        out = self.state.flush(upto=(1 << 62))
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        return self.state.metrics()

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"cep-{self.part_id:04d}-epoch-{epoch:06d}.pkl")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(self.state.snapshot())
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> bool:
        import glob
        import os

        best = None
        for p in glob.glob(os.path.join(
                ckpt_dir, f"cep-{self.part_id:04d}-epoch-*.pkl")):
            e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch and (best is None or e > best[0]):
                best = (e, p)
        if best is None:
            return False
        with open(best[1], "rb") as f:
            self.state.restore(f.read())
        return True


class StreamingCEPJob:
    """Continuous pattern matching over a micro-batch Parquet stream.
    Same epoch pipeline as ``StreamingDedupJob``: epochs submit without
    waiting (per-actor task-queue order keeps state transitions exactly
    sequential), ``max_inflight`` epochs overlap."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a CEP checkpoint: buffered rows and open partial
        sequences re-route by the same partition-key hash the prep
        uses; watermark / flush cursor fold min; job-total counters
        ride partition 0."""
        from .rescale import _pkl_reshard

        return _pkl_reshard(
            self, old_dir, "cep",
            table_fields={"buffer": self.keys, "partials": self.keys},
            min_fields=["watermark", "flushed_upto"],
            sum_fields=["rows_in", "matches_out", "late_drops",
                        "expired_partials"])

    def __init__(self, out_dir: str, *, partition_by: Sequence[str],
                 order_by: str,
                 steps: Sequence[tuple[str, "Expr | Callable"]],
                 contiguity: str = "skip", within: int | None = None,
                 tiebreak: str | None = None,
                 measures: Sequence[str] | None = None,
                 absent: Sequence[tuple] | None = None,
                 lateness_us: int = 0, num_partitions: int = 8,
                 in_schema: pa.Schema | None = None,
                 input_files: Sequence[str] | None = None,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        import json
        import os

        from ..ops.cep import _parse_steps

        if contiguity not in ("strict", "skip"):
            raise ValueError("contiguity must be 'strict' or 'skip'")
        steps = list(steps)
        parsed, _quants = _parse_steps(steps, contiguity)
        names = [n for n, _ in parsed]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate step names: {names}")
        if not partition_by:
            raise ValueError("partition_by is required (patterns are key-local)")
        if order_by in (measures or []):
            raise ValueError(
                f"measures may not repeat order_by ({order_by!r}): each "
                f"step already emits <step>_{order_by}")
        absent = [tuple(a) for a in (absent or [])]
        for na, nb, _p in absent:
            if na not in names or nb not in names:
                raise ValueError(f"absent refers to unknown steps ({na}, {nb})")
            if names.index(na) >= names.index(nb):
                raise ValueError(f"absent steps must be ordered: {na} < {nb}")
        if in_schema is None:
            if not input_files:
                raise ValueError("pass in_schema or input_files")
            in_schema = pq.read_schema(input_files[0])
        measures = list(measures or [])
        preds = [p for _, p in parsed]
        npreds = [p for _, _, p in absent]
        # prune at the read: only key/time/measure/predicate columns ship
        cols = list(dict.fromkeys(
            [*partition_by, order_by, *measures,
             *([tiebreak] if tiebreak else []),
             *[c for p in [*preds, *npreds] if isinstance(p, Expr)
               for c in p.columns()]]))
        self.columns = (cols if all(isinstance(p, Expr)
                                    for p in [*preds, *npreds]) else None)
        pruned = pa.schema([in_schema.field(c) for c in (
            self.columns or in_schema.names)])
        self.spec = {
            "partition_by": list(partition_by), "order_by": order_by,
            "steps": steps, "contiguity": contiguity, "within": within,
            "tiebreak": tiebreak, "measures": measures, "absent": absent,
            "lateness_us": lateness_us, "in_schema": pruned,
        }
        self.P = num_partitions
        self.keys = list(partition_by)
        self.order_by = order_by
        self.sink = TwoPhaseSink(out_dir)
        self.actors = [CEPStateActor.remote(p, out_dir, self.spec)
                       for p in range(num_partitions)]
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.epoch = -1
        self._resume_cursor = -1
        self.metrics: list[dict] = []
        cursor = (os.path.join(checkpoint_dir, "checkpoint.json")
                  if checkpoint_dir else None)
        if resume and cursor and os.path.exists(cursor):
            with open(cursor) as f:
                doc = json.load(f)
            self._resume_cursor = doc["epoch"]
            ray.get([a.restore.remote(checkpoint_dir, doc["epoch"])
                     for a in self.actors])

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return (self.epoch, None, None)
        preps = [
            _cep_prep.options(num_returns=self.P + 1).remote(
                [f], self.columns, self.keys, self.P, self.order_by)
            for f in files_or_tables
        ]
        parts = [list(r) for r in preps]  # P slices + the max-t scalar
        maxes = [pr[self.P] for pr in parts]
        acks = [self.actors[p].process.remote(
            self.epoch, len(preps), *maxes,
            *[parts[i][p] for i in range(len(preps))])
            for p in range(self.P)]
        ckpt = None
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            ckpt = [a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors]
        return (self.epoch, acks, ckpt)

    def _drain_epoch(self, pending) -> dict:
        import json
        import os

        epoch, acks, ckpt = pending
        if acks is None:
            m = {"epoch": epoch, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "matches_out": sum(s["matches_out"] for s in stats),
             "late_drops": sum(s["late_drops"] for s in stats),
             "open_partials": sum(s["open_partials"] for s in stats),
             "expired_partials": sum(s["expired_partials"] for s in stats)}
        self.metrics.append(m)
        self.sink.commit_epoch(epoch)
        if ckpt is not None:
            ray.get(ckpt)
            cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
            tmp = cursor + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cursor)
        return m

    def process_epoch(self, files_or_tables: Sequence) -> dict:
        return self._drain_epoch(self._submit_epoch(files_or_tables))

    def run(self, files: Sequence[str], files_per_epoch: int = 4,
            max_inflight: int = 2) -> None:
        from collections import deque

        pending: deque = deque()
        batch: list = []

        def flush(limit: int) -> None:
            while len(pending) > limit:
                self._drain_epoch(pending.popleft())

        for f in files:
            batch.append(f)
            if len(batch) >= files_per_epoch:
                pending.append(self._submit_epoch(batch))
                batch = []
                flush(max_inflight - 1)
        if batch:
            pending.append(self._submit_epoch(batch))
        flush(0)

    def finish(self) -> dict:
        """End-of-stream: one final flush past every buffered row."""
        self.epoch += 1
        stats = ray.get([a.flush_all.remote(self.epoch)
                         for a in self.actors])
        self.sink.commit_epoch(self.epoch)
        return {"epochs": self.epoch + 1,
                "rows_in": sum(s["rows_in"] for s in stats),
                "matches_out": sum(s["matches_out"] for s in stats),
                "late_drops": sum(s["late_drops"] for s in stats),
                "expired_partials": sum(s["expired_partials"] for s in stats),
                "open_partials": sum(s["open_partials"] for s in stats)}

    def result(self) -> pa.Table:
        return self.sink.read_committed()
