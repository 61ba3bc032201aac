"""Profile/credentials config layer — the engine-local analogue of the
reference's ``decodable/config/*`` (``profile_reader.py``: YAML auth file at
``~/.decodable/auth`` holding per-profile tokens, profile selection via
explicit arg → ``DECODABLE_PROFILE`` env var → default;
``client_config.py``: the per-profile client settings dataclass;
unit-tested at ``tests/unit/decodable/config/test_profile_reader.py:28-42``).

This engine has no control plane to authenticate against, so a profile
carries the *engine* settings a connection string would have carried:
namespace, warehouse dir, and Spark conf overrides. The reader semantics
mirror the reference exactly: a YAML file of named profiles, a missing file
is a hard error with a pointed message, and the active profile resolves
explicit-arg → env var → ``"default"``.

File shape (``~/.dbt_decodable_spark/profiles.yml``)::

    profiles:
      default:
        namespace: analytics
        warehouse_dir: /tmp/warehouse
        spark_conf:
          spark.sql.shuffle.partitions: "32"
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import yaml

DEFAULT_PROFILE_PATH = str(Path.home() / ".dbt_decodable_spark" / "profiles.yml")
PROFILE_ENV_VARIABLE_NAME = "DBT_DECODABLE_SPARK_PROFILE"


class ProfileError(ValueError):
    pass


@dataclass
class EngineProfile:
    """Per-profile engine settings (client_config.py's dataclass role)."""

    name: str
    namespace: str = ""
    warehouse_dir: str | None = None
    spark_conf: dict[str, str] = field(default_factory=dict)


@dataclass
class EngineProfiles:
    """All profiles from one file (profile.py's DecodableAccessTokens role)."""

    profiles: dict[str, EngineProfile]

    def get(self, name: str) -> EngineProfile:
        try:
            return self.profiles[name]
        except KeyError:
            raise ProfileError(
                f"no profile {name!r}; available: {sorted(self.profiles)}"
            ) from None


class ProfileReader:
    """Mirrors DecodableProfileReader (profile_reader.py:28-56)."""

    @staticmethod
    def load_profiles(path: str = DEFAULT_PROFILE_PATH) -> EngineProfiles:
        p = Path(path)
        if not p.is_file():
            # reference raises with a pointed remediation message
            # (profile_reader.py:34-37)
            raise ProfileError(
                f"no engine profile under path: {p}. Create a profiles.yml first"
            )
        return ProfileReader._load(p.read_text())

    @staticmethod
    def get_profile_name(profile_name: str | None) -> str:
        """Explicit arg → env var → 'default' (profile_reader.py:41-46)."""
        if profile_name is not None:
            return profile_name
        return os.getenv(PROFILE_ENV_VARIABLE_NAME) or "default"

    @staticmethod
    def _load(text: str) -> EngineProfiles:
        data = yaml.safe_load(text) or {}
        raw = data.get("profiles")
        if not isinstance(raw, dict) or not raw:
            raise ProfileError("profiles.yml must contain a non-empty 'profiles' mapping")
        out: dict[str, EngineProfile] = {}
        for name, spec in raw.items():
            spec = spec or {}
            out[name] = EngineProfile(
                name=name,
                namespace=str(spec.get("namespace", "") or ""),
                warehouse_dir=spec.get("warehouse_dir"),
                spark_conf={str(k): str(v) for k, v in (spec.get("spark_conf") or {}).items()},
            )
        return EngineProfiles(profiles=out)


def engine_from_profile(
    spark,
    profile: str | None = None,
    path: str = DEFAULT_PROFILE_PATH,
):
    """Build an :class:`~dbt_decodable_spark.catalog.Engine` from a profile:
    apply the profile's Spark conf overrides to the session, then construct
    the engine with its namespace/warehouse settings."""
    from dbt_decodable_spark.catalog import Engine

    prof = ProfileReader.load_profiles(path).get(ProfileReader.get_profile_name(profile))
    for k, v in prof.spark_conf.items():
        spark.conf.set(k, v)
    return Engine(spark, namespace=prof.namespace, warehouse_dir=prof.warehouse_dir)
