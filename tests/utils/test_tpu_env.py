"""runtime/tpu_env.py: the scoped-VMEM env knob + the folded-layout gate."""

import pytest

from qflux_tpu.runtime import tpu_env
from qflux_tpu.ops import flash_nr


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.delenv(tpu_env._MARKER, raising=False)
    monkeypatch.delenv("QFLUX_NR_FOLD", raising=False)


def test_configure_appends_flag_and_marker(monkeypatch):
    # tests run on CPU: the backend-initialized guard only bails on TPU
    monkeypatch.setattr(tpu_env, "_backend_up", lambda: False)
    assert tpu_env.configure_scoped_vmem(12345)
    import os
    assert os.environ["LIBTPU_INIT_ARGS"].endswith(
        "--xla_tpu_scoped_vmem_limit_kib=12345")
    assert tpu_env.scoped_vmem_raised()
    # idempotent: second call keeps ONE flag instance
    assert tpu_env.configure_scoped_vmem(99999)
    assert os.environ["LIBTPU_INIT_ARGS"].count("scoped_vmem_limit_kib") == 1


def test_existing_user_flag_wins(monkeypatch):
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--foo=1 --xla_tpu_scoped_vmem_limit_kib=65536")
    assert tpu_env.configure_scoped_vmem()
    import os
    assert "49152" not in os.environ["LIBTPU_INIT_ARGS"]
    assert os.environ[tpu_env._MARKER] == "65536"
    assert tpu_env.scoped_vmem_raised()


def test_backend_already_up_refuses(monkeypatch):
    monkeypatch.setattr(tpu_env, "_backend_up", lambda: True)
    assert not tpu_env.configure_scoped_vmem()
    assert not tpu_env.scoped_vmem_raised()


def test_opt_out_marker(monkeypatch):
    monkeypatch.setattr(tpu_env, "_backend_up", lambda: False)
    monkeypatch.setenv(tpu_env._MARKER, "0")
    assert not tpu_env.configure_scoped_vmem()
    import os
    assert "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", "")
    assert not tpu_env.scoped_vmem_raised()


def test_malformed_bare_flag_no_crash(monkeypatch):
    """A bare / space-separated flag (no '=value') is ignored by libtpu;
    the preamble must record nothing rather than crash with IndexError."""
    monkeypatch.setattr(tpu_env, "_backend_up", lambda: False)
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       f"{tpu_env._FLAG} --other_flag=1")
    assert not tpu_env.configure_scoped_vmem()
    assert not tpu_env.scoped_vmem_raised()


def test_nonnumeric_marker_ignored(monkeypatch):
    """A corrupt re-exported marker must not turn the entrypoint preamble
    into a ValueError — fall through and re-derive from the default."""
    monkeypatch.setattr(tpu_env, "_backend_up", lambda: False)
    monkeypatch.setenv(tpu_env._MARKER, "banana")
    assert tpu_env.configure_scoped_vmem(12345)
    import os
    assert "--xla_tpu_scoped_vmem_limit_kib=12345" in \
        os.environ["LIBTPU_INIT_ARGS"]
    assert os.environ[tpu_env._MARKER] == "12345"


def test_bare_env_flag_without_marker_not_raised(monkeypatch):
    """scoped_vmem_raised() requires the marker recorded by
    configure_scoped_vmem — a user-exported flag that never went through the
    preamble (e.g. set after backend init, so libtpu never saw it) must NOT
    default the folded layout on: the merged backward would die at compile
    time with 'Scoped allocation exceeded scoped vmem limit' and no remat
    fallback recognizes that error class (ADVICE r4)."""
    monkeypatch.setenv("LIBTPU_INIT_ARGS", f"{tpu_env._FLAG}=49152")
    # marker absent: flag presence alone is not proof it is live
    assert not tpu_env.scoped_vmem_raised()


def test_fold_default_gating(monkeypatch):
    # explicit env var wins over everything
    monkeypatch.setenv("QFLUX_NR_FOLD", "0")
    assert flash_nr._fold_default() is False
    monkeypatch.setenv("QFLUX_NR_FOLD", "1")
    assert flash_nr._fold_default() is True
    monkeypatch.delenv("QFLUX_NR_FOLD")
    # interpret mode (CPU tests): folded on without the env marker
    assert flash_nr._interpret()
    assert flash_nr._fold_default() is True
    # real-TPU path: follows scoped_vmem_raised()
    monkeypatch.setattr(flash_nr, "_interpret", lambda: False)
    assert flash_nr._fold_default() is False
    # a bare flag export is NOT enough (could postdate backend init);
    # going through the preamble (flag + verified marker) is
    monkeypatch.setenv("LIBTPU_INIT_ARGS", f"{tpu_env._FLAG}=49152")
    assert flash_nr._fold_default() is False
    monkeypatch.setenv(tpu_env._MARKER, "49152")
    assert flash_nr._fold_default() is True
    # explicit opt-out zeroes the marker even with the flag live
    monkeypatch.setenv(tpu_env._MARKER, "0")
    assert flash_nr._fold_default() is False
