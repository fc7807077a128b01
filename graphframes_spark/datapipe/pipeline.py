"""Audited corpus-pipeline composition: chain dp-tier stages with
per-stage row accounting that costs zero extra Spark jobs.

Beyond-reference: a production 100 TB corpus build is a *sequence* —
normalize → dedup → decontaminate → sample → pack — and the first thing
an operator asks after a run is "how many documents did each stage
drop?". Answering that with ``count()`` per stage would re-execute the
growing plan prefix once per stage (quadratic re-scans). This module
threads a ``pyspark.sql.Observation`` through each stage boundary
instead: the counters ride the single materialization the caller was
going to do anyway, exactly like the convergence probes the Pregel
engine folds into its checkpoint actions (pregel.py).

Caveat: a stage that internally materializes (e.g. ``minhash_lsh_dedup``
runs connected components with its own actions) fires its upstream
observations at that point; the numbers are still correct, the single-
pass property just narrows to the stages between materializations.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graphframes_spark.util import GraphFramesError

Stage = Tuple[str, Callable[[DataFrame], DataFrame]]


class CorpusPipeline:
    """Compose named corpus stages; run with free row auditing.

    >>> pipe = CorpusPipeline([
    ...     ("dedup", lambda df: cross_corpus_dedup(df, ref)),
    ...     ("decontam", lambda df: decontaminate(df, bench)),
    ... ])
    >>> out = pipe.apply(docs)          # lazy; observations attached
    >>> out.write.parquet(...)          # ONE pass executes everything
    >>> pipe.report()                   # [{'stage': 'input', 'rows': ...}, ...]
    """

    def __init__(self, stages: Sequence[Stage]):
        if not stages:
            raise GraphFramesError("CorpusPipeline needs at least one stage")
        names = [name for name, _ in stages]
        if len(set(names)) != len(names):
            raise GraphFramesError(f"duplicate stage names: {names}")
        self._stages = list(stages)
        self._obs: list[Tuple[str, Observation]] = []

    def apply(self, df: DataFrame) -> DataFrame:
        """Chain every stage onto ``df`` with an observed row counter at
        each boundary (input included). Lazy — nothing executes until
        the caller's action."""
        self._obs = []

        def observed(label: str, d: DataFrame) -> DataFrame:
            obs = Observation()
            self._obs.append((label, obs))
            return d.observe(obs, F.count(F.lit(1)).alias("rows"))

        out = observed("input", df)
        for name, fn in self._stages:
            out = observed(name, fn(out))
        return out

    def report(self) -> list[dict]:
        """Per-stage row counts (valid after the pipeline's action ran):
        ``[{stage, rows, dropped}, ...]`` where ``dropped`` is relative
        to the previous stage. Blocks until each observation's plan
        fragment has executed."""
        if not self._obs:
            raise GraphFramesError("apply() has not been called")
        rows = [(label, obs.get["rows"]) for label, obs in self._obs]
        out = []
        prev = None
        for label, n in rows:
            out.append(
                {
                    "stage": label,
                    "rows": n,
                    "dropped": (prev - n) if prev is not None else 0,
                }
            )
            prev = n
        return out
