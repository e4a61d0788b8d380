"""Typed env-var configuration, medallion zone paths, batch lineage.

Reference parity:
  - ``get_env_var`` with required/default semantics — ``utils/fonctions.py:95-122``.
  - ``Paths`` (bronze/silver/gold/archive zone dirs) — ``scripts/__init__.py:30-42``.
  - ``batch_id`` correlation UUID stamped on every run — ``pipelines/__init__.py:1-7``.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field


class MissingEnvVar(RuntimeError):
    pass


def get_env_var(name: str, default: str | None = None, required: bool = False) -> str | None:
    """Fetch an env var; raise if required and absent (reference
    ``utils/fonctions.py:95-122`` raises on missing required vars)."""
    value = os.environ.get(name)
    if value is None or value == "":
        if required and default is None:
            raise MissingEnvVar(f"required environment variable {name!r} is not set")
        return default
    return value


def new_batch_id() -> str:
    """Correlation id for one pipeline run (``pipelines/__init__.py:1-7``)."""
    return str(uuid.uuid4())


@dataclass
class ZonePaths:
    """Medallion layout (``scripts/__init__.py:37-40``). Any Hadoop-
    compatible URI works: local paths, s3a://, hdfs://."""

    root: str = field(default_factory=lambda: get_env_var("ENGINE_DATA_ROOT", "./data"))

    @property
    def bronze(self) -> str:
        return get_env_var("ENGINE_PATH_BRONZE", f"{self.root}/bronze")

    @property
    def silver(self) -> str:
        return get_env_var("ENGINE_PATH_SILVER", f"{self.root}/silver")

    @property
    def gold(self) -> str:
        return get_env_var("ENGINE_PATH_GOLD", f"{self.root}/gold")

    @property
    def archive(self) -> str:
        return get_env_var("ENGINE_PATH_ARCHIVE", f"{self.root}/archive")


@dataclass
class EngineConfig:
    """Everything a pipeline run needs, resolved once at start."""

    env: str = field(default_factory=lambda: get_env_var("ENGINE_ENV", "LOCAL") or "LOCAL")
    zones: ZonePaths = field(default_factory=ZonePaths)
    batch_id: str = field(default_factory=new_batch_id)
    jdbc_url: str | None = field(default_factory=lambda: get_env_var("ENGINE_JDBC_URL"))
    jdbc_user: str | None = field(default_factory=lambda: get_env_var("ENGINE_JDBC_USER"))
    jdbc_password: str | None = field(default_factory=lambda: get_env_var("ENGINE_JDBC_PASSWORD"))

    @property
    def jdbc_properties(self) -> dict[str, str]:
        props: dict[str, str] = {"driver": "org.postgresql.Driver"}
        if self.jdbc_user:
            props["user"] = self.jdbc_user
        if self.jdbc_password:
            props["password"] = self.jdbc_password
        return props
