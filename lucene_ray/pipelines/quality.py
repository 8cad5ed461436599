"""Search-quality evaluation (`benchmark/src/java/org/apache/lucene/
benchmark/quality/` — QualityStats.java, QualityBenchmark.java,
trec/TrecJudge.java): precision@n with the reference's short-list
extrapolation, average precision at recall points (MAP), recall, and
the reference's top-5-gated MRR, averaged over judged queries exactly
like QualityStats.average (measures over queries WITH judgements only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAX_POINTS = 20          # QualityStats.MAX_POINTS


class QualityStats:
    """Per-query stats accumulator (QualityStats.java:60-126)."""

    def __init__(self, max_good_points: float):
        self.max_good_points = float(max_good_points)
        self.recall = 0.0
        self.p_at = np.zeros(MAX_POINTS + 1)    # p_at[0] unused
        self.p_relevant_sum = 0.0
        self.num_points = 0.0
        self.num_good_points = 0.0
        self.mrr = 0.0

    def add_result(self, n: int, is_relevant: bool):
        if abs(self.num_points + 1 - n) > 1e-6:
            raise ValueError(f"point {n} illegal after {self.num_points}")
        if is_relevant:
            self.num_good_points += 1
            # first relevant doc, but only within the top 5 (:86)
            if self.num_good_points == 1 and n <= 5:
                self.mrr = 1.0 / n
        self.num_points = float(n)
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = p if self.max_good_points <= 0 \
            else self.num_good_points / self.max_good_points

    def precision_at(self, n: int) -> float:
        """P@n; ranks beyond the result list extrapolate as
        numPoints * pAt[numPoints] / n (:109-113)."""
        if not (1 <= n <= MAX_POINTS):
            raise ValueError(f"n={n} outside [1, {MAX_POINTS}]")
        if n > self.num_points:
            np_ = int(self.num_points)
            return (self.num_points * self.p_at[np_]) / n if np_ else 0.0
        return float(self.p_at[n])

    def avp(self) -> float:
        """Average precision at recall points (MAP component)."""
        return 0.0 if self.max_good_points == 0 \
            else self.p_relevant_sum / self.max_good_points

    @staticmethod
    def average(stats: list["QualityStats"]) -> "QualityStats":
        """QualityStats.average: measures averaged over queries with
        positive judgements only."""
        avg = QualityStats(0)
        good = [s for s in stats if s.max_good_points > 0]
        m = len(good)
        if m == 0:
            return avg
        avg.num_good_points = sum(s.num_good_points for s in good) / m
        avg.num_points = sum(s.num_points for s in good) / m
        avg.recall = sum(s.recall for s in good) / m
        avg.mrr = sum(s.mrr for s in good) / m
        avg.max_good_points = sum(s.max_good_points for s in good) / m
        for j in range(1, MAX_POINTS + 1):
            avg.p_at[j] = sum(s.precision_at(j) for s in good) / m
        avg.p_relevant_sum = (sum(s.avp() for s in good) / m) \
            * avg.max_good_points
        return avg


def parse_trec_qrels(text: str) -> dict[str, set[str]]:
    """TrecJudge qrels format: 'qid 0 docname isRelevant' per line —
    only positive judgements are kept."""
    rel: dict[str, set[str]] = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) != 4:
            continue
        qid, _zero, doc, r = parts
        rel.setdefault(qid, set())
        if r not in ("0", "0.0"):
            rel[qid].add(doc)
    return rel


class TrecJudge:
    """Judge over parsed qrels (trec/TrecJudge.java): isRelevant +
    maxRecall = number of known relevant docs for the query."""

    def __init__(self, qrels: dict[str, set[str]]):
        self.qrels = qrels

    def is_relevant(self, doc_name: str, qid: str) -> bool:
        return doc_name in self.qrels.get(qid, ())

    def max_recall(self, qid: str) -> int:
        return len(self.qrels.get(qid, ()))


def quality_benchmark(searcher, quality_queries, judge,
                      max_results: int = 1000):
    """QualityBenchmark.execute: run each (qid, query) against the
    searcher, judge the ranked doc names (conv_id:turn_idx), and return
    per-query QualityStats in input order.  ``query`` entries may be
    Query objects or classic-parser strings."""
    from ..search.query import parse_query

    out = []
    for qid, q in quality_queries:
        if isinstance(q, str):
            q = parse_query(q)
        td = searcher.search(q, k=max_results,
                             total_hits_threshold=2**31 - 1)
        st = QualityStats(judge.max_recall(qid))
        for i, h in enumerate(td.hits, 1):
            st.add_result(i, judge.is_relevant(
                f"{h.conv_id}:{int(h.turn_idx)}", qid))
        out.append(st)
    return out
