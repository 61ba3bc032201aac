"""Profile/config layer tests — mirrors the reference's profile-reader unit
tests (tests/unit/decodable/config/test_profile_reader.py:28-42): profile
name resolution (arg → env → default), loading a profile file, and the
missing-file error, plus engine construction from a profile."""

import os
from unittest import mock

import pytest

from dbt_decodable_spark.config import (
    PROFILE_ENV_VARIABLE_NAME,
    EngineProfiles,
    ProfileError,
    ProfileReader,
    engine_from_profile,
)

PROFILES_YML = """
profiles:
  default:
    namespace: defns
    spark_conf:
      spark.sql.ansi.enabled: "false"
  prod:
    namespace: prodns
    warehouse_dir: {wh}
"""


@pytest.fixture
def profile_file(tmp_path):
    p = tmp_path / "profiles.yml"
    p.write_text(PROFILES_YML.format(wh=tmp_path / "wh"))
    return str(p)


class TestProfileName:
    @mock.patch.dict(os.environ, {PROFILE_ENV_VARIABLE_NAME: "test"})
    def test_env_var_and_explicit_arg(self):
        # explicit arg wins; env var fills in; reference semantics
        assert ProfileReader.get_profile_name(None) == "test"
        assert ProfileReader.get_profile_name("default") == "default"

    def test_default_without_env(self):
        env = {k: v for k, v in os.environ.items() if k != PROFILE_ENV_VARIABLE_NAME}
        with mock.patch.dict(os.environ, env, clear=True):
            assert ProfileReader.get_profile_name(None) == "default"


class TestLoadProfiles:
    def test_load(self, profile_file):
        profs: EngineProfiles = ProfileReader.load_profiles(profile_file)
        assert profs.get("default").namespace == "defns"
        assert profs.get("prod").warehouse_dir is not None
        assert profs.get("default").spark_conf == {"spark.sql.ansi.enabled": "false"}

    def test_missing_file_is_pointed_error(self, tmp_path):
        with pytest.raises(ProfileError, match="no engine profile under path"):
            ProfileReader.load_profiles(str(tmp_path / "nope.yml"))

    def test_unknown_profile(self, profile_file):
        with pytest.raises(ProfileError, match="no profile 'staging'"):
            ProfileReader.load_profiles(profile_file).get("staging")

    def test_empty_file_rejected(self, tmp_path):
        p = tmp_path / "bad.yml"
        p.write_text("profiles:\n")
        with pytest.raises(ProfileError, match="non-empty 'profiles' mapping"):
            ProfileReader.load_profiles(str(p))


class TestEngineFromProfile:
    def test_builds_engine_and_applies_conf(self, spark, profile_file):
        eng = engine_from_profile(spark, profile="prod", path=profile_file)
        assert eng.namespace == "prodns"
        assert eng.warehouse_dir and eng.warehouse_dir.endswith("wh")

    def test_profile_via_env(self, spark, profile_file):
        with mock.patch.dict(os.environ, {PROFILE_ENV_VARIABLE_NAME: "prod"}):
            eng = engine_from_profile(spark, path=profile_file)
        assert eng.namespace == "prodns"
