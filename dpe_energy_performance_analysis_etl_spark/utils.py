"""Cross-cutting utilities: retry, structured run logging, naming.

Reference parity:
  - retryable task wrapper (``@task(retries=3, retry_delay_seconds=10)``
    on every step, e.g. ``extract.py:112``) — orchestrator-agnostic
    ``retry`` decorator here.
  - structured run-logging decorator (duration_ms, correlation_id,
    status, severity — ``utils/__init__.py:156-182``).
  - column-name slug: unidecode-fold + collapse non-alphanumerics to
    ``_`` + lowercase (``utils/fonctions.py:59-73``). Pure Python — it
    operates on column *names*, never on row data.
  - dated file names (``utils/fonctions.py:75-79``).
"""

from __future__ import annotations

import datetime as _dt
import functools
import json
import logging
import re
import time
import unicodedata
from collections.abc import Callable
from typing import Any, TypeVar

logger = logging.getLogger("dpe_spark_engine")

F = TypeVar("F", bound=Callable[..., Any])

_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


@functools.lru_cache(maxsize=4096)
def normalize_name(name: str) -> str:
    """ASCII-fold, collapse runs of non-alphanumerics to ``_``,
    lowercase. Matches ``utils/fonctions.py:59-67`` exactly — edge
    underscores are KEPT (``_id_ademe`` is a primary key in the gold
    schema; stripping it silently detaches the golden config from the
    normalized silver columns).

    >>> normalize_name("Consommation annuelle (MWh) ÉTÉ")
    'consommation_annuelle_mwh_ete'
    >>> normalize_name("_id_ademe")
    '_id_ademe'
    """
    folded = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    return _NON_ALNUM.sub("_", folded).lower()


def today_str(days_back: int = 0, fmt: str = "%Y_%m_%d") -> str:
    """File-naming date stamp (``utils/fonctions.py:75-79``)."""
    return (_dt.date.today() - _dt.timedelta(days=days_back)).strftime(fmt)


def retry(times: int = 3, delay_seconds: float = 10.0, exceptions: tuple = (Exception,)):
    """Retry decorator replacing the reference's Prefect task retries."""

    def deco(fn: F) -> F:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last: BaseException | None = None
            for attempt in range(times + 1):
                try:
                    return fn(*args, **kwargs)
                except exceptions as exc:  # noqa: PERF203
                    last = exc
                    if attempt < times:
                        logger.warning(
                            "retry %s/%s for %s after %s: %s",
                            attempt + 1, times, fn.__name__, type(exc).__name__, exc,
                        )
                        time.sleep(delay_seconds)
            raise last  # type: ignore[misc]

        return wrapper  # type: ignore[return-value]

    return deco


def log_run(correlation_id: str | None = None):
    """Structured log record per call: name, duration_ms, status,
    severity, correlation_id (``utils/__init__.py:29-50,156-182``)."""

    def deco(fn: F) -> F:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            start = time.perf_counter()
            record: dict[str, Any] = {
                "op": fn.__qualname__,
                "correlation_id": correlation_id,
                "status": "SUCCESS",
                "severity": "INFO",
            }
            try:
                return fn(*args, **kwargs)
            except BaseException as exc:
                record.update(status="FAILURE", severity="ERROR", error=repr(exc))
                raise
            finally:
                record["duration_ms"] = round(1000 * (time.perf_counter() - start), 2)
                logger.info(json.dumps(record, default=str))

        return wrapper  # type: ignore[return-value]

    return deco
