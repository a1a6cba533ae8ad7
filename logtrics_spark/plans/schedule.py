"""Scheduler APIs — the reference's open TODO item, implemented.

The reference lists "Scheduler APIs" as unimplemented
(/root/reference/TODO.md:6): by symmetry with its flush loop (a fixed
``graphite.interval`` ticker, graphite/graphite.go:61-64), the intended
surface is time-scheduled execution of maintenance work.  Here that is
a standard 5-field cron scheduler driving the daemon's housekeeping
(compact / cascade — plans/daemon.py) and any user-registered callable,
checked once per daemon flush tick.

Design constraints:

- **Deterministic and driver-side.**  ``CronSpec.next_after`` is a pure
  function of the spec and a datetime; every entry point takes an
  explicit ``now`` so tests never sleep.  The scheduler itself runs on
  the driver between flush ticks — jobs it fires (compact, cascade) are
  Spark jobs, so the cluster does the work; the cron math is O(1).
- **At-most-once per matching minute.**  ``Scheduler.run_due`` fires a
  job at most once per cron-matching minute, and if the process slept
  across several matching minutes (a long tick, a paused VM) it fires
  ONCE for the missed span rather than backfilling a storm — the jobs
  it drives are idempotent store sweeps where a catch-up run subsumes
  the missed ones.
- **Standard cron semantics**, minute resolution, evaluated in UTC
  (the store's day partitioning and window epochs are UTC):
  ``minute hour day-of-month month day-of-week`` with ``*``, lists
  ``a,b``, ranges ``a-b``, steps ``*/n`` and ``a-b/n``, month/dow names
  (``jan``..``dec``, ``sun``..``sat``), dow 0 or 7 = Sunday, and the
  classic quirk: when BOTH day-of-month and day-of-week are restricted,
  a time matches if EITHER matches (vixie-cron behavior).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any, Callable

logger = logging.getLogger("logtrics_spark.schedule")

_MONTHS = {m: i + 1 for i, m in enumerate(
    "jan feb mar apr may jun jul aug sep oct nov dec".split()
)}
_DOWS = {d: i for i, d in enumerate(
    "sun mon tue wed thu fri sat".split()
)}

# (low, high, name-table) per field position
_FIELDS = [
    (0, 59, None),     # minute
    (0, 23, None),     # hour
    (1, 31, None),     # day of month
    (1, 12, _MONTHS),  # month
    (0, 7, _DOWS),     # day of week (0 and 7 both Sunday)
]


def _parse_atom(atom: str, lo: int, hi: int, names: dict | None) -> set[int]:
    step = 1
    if "/" in atom:
        atom, step_s = atom.split("/", 1)
        try:
            step = int(step_s)
        except ValueError:
            raise ValueError(f"invalid cron step {step_s!r}")
        if step < 1:
            raise ValueError(f"invalid cron step {step}")

    def resolve(tok: str) -> int:
        t = tok.strip().lower()
        if names and t in names:
            return names[t]
        try:
            v = int(t)
        except ValueError:
            raise ValueError(f"invalid cron value {tok!r}")
        if not (lo <= v <= hi):
            raise ValueError(f"cron value {v} out of range [{lo},{hi}]")
        return v

    if atom == "":
        # a bare "/n" step or a typo'd list ("0,,30", trailing comma)
        # must not silently expand to the full range
        raise ValueError("empty cron atom")
    if atom == "*":
        start, end = lo, hi
    elif "-" in atom:
        a, b = atom.split("-", 1)
        start, end = resolve(a), resolve(b)
        if end < start:
            raise ValueError(f"reversed cron range {atom!r}")
    else:
        v = resolve(atom)
        if step != 1:  # `N/step` means start at N (vixie extension)
            start, end = v, hi
        else:
            return {v}
    return set(range(start, end + 1, step))


@dataclass(frozen=True)
class CronSpec:
    """Parsed 5-field cron expression; minute resolution, UTC."""

    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool
    expr: str

    @classmethod
    def parse(cls, expr: str) -> "CronSpec":
        parts = expr.split()
        if len(parts) != 5:
            raise ValueError(
                f"cron expression needs 5 fields, got {len(parts)}: {expr!r}"
            )
        sets = []
        for raw, (lo, hi, names) in zip(parts, _FIELDS):
            vals: set[int] = set()
            for atom in raw.split(","):
                vals |= _parse_atom(atom, lo, hi, names)
            sets.append(frozenset(vals))
        mins, hours, doms, months, dows = sets
        if 7 in dows:  # 7 == Sunday == 0
            dows = frozenset((dows - {7}) | {0})
        return cls(
            minutes=mins, hours=hours, doms=doms, months=months, dows=dows,
            dom_restricted=parts[2] != "*", dow_restricted=parts[4] != "*",
            expr=expr,
        )

    def matches(self, dt: datetime) -> bool:
        dt = _to_utc(dt)
        if dt.minute not in self.minutes or dt.hour not in self.hours:
            return False
        if dt.month not in self.months:
            return False
        dom_ok = dt.day in self.doms
        # python weekday(): Mon=0..Sun=6 -> cron Sun=0..Sat=6
        dow_ok = ((dt.weekday() + 1) % 7) in self.dows
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # the vixie OR quirk
        return dom_ok and dow_ok

    def next_after(self, dt: datetime) -> datetime:
        """Smallest minute-aligned instant strictly AFTER ``dt`` that
        matches.  Walks minute-aligned candidates, skipping whole days/
        hours that cannot match — bounded by ~4 years of iterations
        (cron specs with a Feb-29 dom take up to 4 years to fire)."""
        t = _to_utc(dt).replace(second=0, microsecond=0) + timedelta(minutes=1)
        # hard stop: 366*4+1 days out; any valid spec fires within that
        limit = t + timedelta(days=1465)
        while t < limit:
            if t.month not in self.months:
                # jump to the 1st of the next month
                nxt = (t.replace(day=1) + timedelta(days=32)).replace(
                    day=1, hour=0, minute=0
                )
                t = nxt
                continue
            day_ok = (
                (t.day in self.doms or ((t.weekday() + 1) % 7) in self.dows)
                if (self.dom_restricted and self.dow_restricted)
                else (t.day in self.doms
                      and ((t.weekday() + 1) % 7) in self.dows)
            )
            if not day_ok:
                t = (t + timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if t.hour not in self.hours:
                t = (t + timedelta(hours=1)).replace(minute=0)
                continue
            if t.minute not in self.minutes:
                t += timedelta(minutes=1)
                continue
            return t
        raise ValueError(f"cron spec {self.expr!r} never fires")


def _to_utc(dt: datetime) -> datetime:
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


@dataclass
class _Job:
    name: str
    spec: CronSpec
    fn: Callable[[], Any]


@dataclass
class Scheduler:
    """Registry of cron jobs, polled with an explicit clock.

    ``run_due(now)`` fires every job whose spec matched some minute in
    ``(last_checked, now]`` — at most once per call per job (missed
    minutes coalesce; the driven jobs are idempotent sweeps).  Errors
    are isolated per job (logged, other jobs still run) — the same
    isolation contract as rule dispatch (api.py B2).
    """

    jobs: dict[str, _Job] = field(default_factory=dict)
    last_checked: datetime | None = None

    def register(self, name: str, expr: str | CronSpec, fn: Callable[[], Any]) -> None:
        if name in self.jobs:
            raise ValueError(f"duplicate scheduled job {name!r}")
        spec = expr if isinstance(expr, CronSpec) else CronSpec.parse(expr)
        self.jobs[name] = _Job(name, spec, fn)

    def due(self, now: datetime) -> list[str]:
        """Names of jobs with a matching minute since the last check
        (or matching NOW on the very first check), without firing."""
        now = _to_utc(now).replace(second=0, microsecond=0)
        prev = self.last_checked
        out = []
        for j in self.jobs.values():
            if prev is None:
                if j.spec.matches(now):
                    out.append(j.name)
            elif j.spec.next_after(prev) <= now:
                out.append(j.name)
        return out

    def run_due(self, now: datetime) -> dict[str, Any]:
        """Fire due jobs; returns {name: result-or-exception}.  Advances
        the checked watermark even when a job raises (no retry storm)."""
        fired: dict[str, Any] = {}
        for name in self.due(now):
            job = self.jobs[name]
            try:
                fired[name] = job.fn()
            except Exception as exc:  # noqa: BLE001 — job isolation
                logger.exception("scheduled job %s failed", name)
                fired[name] = exc
        # monotonic watermark: a backwards clock step (NTP correction,
        # resumed VM) must not rewind last_checked, or a minute that
        # already fired would fire again once the clock re-crosses it
        now_m = _to_utc(now).replace(second=0, microsecond=0)
        prev = self.last_checked
        self.last_checked = now_m if prev is None else max(prev, now_m)
        return fired


def scheduler_from_config(
    conf: dict[str, Any], builtins: dict[str, Callable[[], Any]]
) -> Scheduler | None:
    """Build a Scheduler from the ``[schedule]`` config table.

    Keys are job names; values are cron strings.  Names present in
    ``builtins`` (the daemon passes ``compact`` / ``cascade``) bind to
    those callables; unknown names raise at load time (config errors
    surface before the daemon starts, like FORBIDDEN key checks).
    Returns None when the section is absent/empty.
    """
    section = conf.get("schedule") or {}
    if not section:
        return None
    sched = Scheduler()
    for name, expr in section.items():
        if name not in builtins:
            raise ValueError(
                f"[schedule] job {name!r} is not schedulable; "
                f"known jobs: {sorted(builtins)}"
            )
        if not isinstance(expr, str):
            raise ValueError(f"[schedule] {name} must be a cron string")
        sched.register(name, expr, builtins[name])
    return sched
