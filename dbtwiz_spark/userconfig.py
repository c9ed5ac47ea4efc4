"""User configuration: typed settings in ``config.toml``.

Reference semantics: ``dbtwiz config <setting> <value>`` updates a
validated user-level TOML config (dbtwiz/config/user.py:38-146 UserConfig,
docs/config.md); unknown settings and invalid values are hard errors, and
``sql_formatter`` gets a platform-specific default
(dbtwiz/config/user.py:134-141). The engine keeps the same surface minus
the GCP-only ``auth_check`` and adds the engine-relevant
``shuffle_partitions`` default consumed by ``session.get_spark`` (env
``SPARK_GRAFT_SHUFFLE`` still wins — explicit beats persisted).

Config lives at ``$DBTWIZ_SPARK_CONFIG_DIR/config.toml`` (default
``~/.config/dbtwiz_spark``); tomllib reads it, and writes go through a
minimal scalar-only TOML emitter (the stdlib has no writer).
"""

from __future__ import annotations

import os
import platform
import tomllib
from dataclasses import dataclass, field, fields
from pathlib import Path


def _default_formatter() -> str:
    sysname = platform.system()
    if sysname == "Windows":
        return "powershell cat"
    if sysname == "Darwin":
        return "cat -s"
    return "fmt -s"


@dataclass
class UserConfig:
    """Validated user settings (reference: dbtwiz/config/user.py:38)."""

    editor_command: str = field(
        default="code {}",
        metadata={
            "help": "Editor command; '{}' marks where the file path goes "
            "(appended if absent)."
        },
    )
    log_debug: bool = field(
        default=False,
        metadata={"help": "Debug logging of internal engine operations."},
    )
    sql_formatter: str = field(
        default_factory=_default_formatter,
        metadata={
            "help": "Formatter command for prerendered model previews in "
            "the interactive picker (platform-specific default)."
        },
    )
    theme: str = field(
        default="light",
        metadata={"help": "'light' or 'dark' picker/output color scheme."},
    )
    shuffle_partitions: int = field(
        default=32,
        metadata={
            "help": "Default spark.sql.shuffle.partitions when the "
            "SPARK_GRAFT_SHUFFLE env var is unset."
        },
    )

    def validate(self) -> None:
        if self.theme not in ("light", "dark"):
            raise ValueError("theme must be one of ['light', 'dark']")
        # bool is an int subclass in Python: `shuffle_partitions = true`
        # would otherwise pass the isinstance(int) gate and silently run
        # with ONE shuffle partition
        if isinstance(self.shuffle_partitions, bool) or not isinstance(
            self.shuffle_partitions, int
        ) or not (1 <= self.shuffle_partitions <= 100_000):
            raise ValueError("shuffle_partitions must be an int in [1, 100000]")
        for f in fields(self):
            v = getattr(self, f.name)
            if f.type == "bool" and not isinstance(v, bool):
                raise ValueError(f"{f.name} must be a boolean")
            if f.type == "str" and not isinstance(v, str):
                raise ValueError(f"{f.name} must be a string")
            if f.type == "int" and isinstance(v, bool):
                raise ValueError(f"{f.name} must be an int, not a boolean")


def config_dir() -> Path:
    override = os.environ.get("DBTWIZ_SPARK_CONFIG_DIR")
    if override:
        return Path(override)
    return Path.home() / ".config" / "dbtwiz_spark"


def config_path() -> Path:
    return config_dir() / "config.toml"


def load_user_config() -> UserConfig:
    """Load config.toml, fall back to defaults on absence (reference
    behavior: a corrupt file degrades to defaults rather than crashing
    every command — dbtwiz/config/user.py:23-36)."""
    p = config_path()
    if p.exists():
        try:
            data = tomllib.loads(p.read_text())
            known = {f.name for f in fields(UserConfig)}
            cfg = UserConfig(**{k: v for k, v in data.items() if k in known})
            cfg.validate()
            return cfg
        except Exception:  # noqa: BLE001 — corrupt config: defaults, not a crash
            pass
    return UserConfig()


def _toml_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def save_user_config(cfg: UserConfig) -> Path:
    cfg.validate()
    p = config_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        f"{f.name} = {_toml_scalar(getattr(cfg, f.name))}" for f in fields(cfg)
    ]
    p.write_text("\n".join(lines) + "\n")
    return p


def coerce(setting: str, raw: str):
    """Parse a CLI string to the setting's declared type; unknown settings
    and malformed values are hard errors (reference: typed pydantic
    validation on assignment)."""
    spec = {f.name: f for f in fields(UserConfig)}.get(setting)
    if spec is None:
        raise KeyError(
            f"unknown setting {setting!r}; valid: {sorted(spec_names())}"
        )
    if spec.type == "bool":
        low = raw.strip().lower()
        if low in ("true", "1", "yes", "on"):
            return True
        if low in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"{setting} expects a boolean, got {raw!r}")
    if spec.type == "int":
        return int(raw)
    return raw


def spec_names() -> list[str]:
    return [f.name for f in fields(UserConfig)]


def update_setting(setting: str, raw: str) -> tuple[UserConfig, Path]:
    """The ``config <setting> <value>`` operation: load, set, validate,
    persist."""
    cfg = load_user_config()
    value = coerce(setting, raw)
    setattr(cfg, setting, value)
    cfg.validate()
    return cfg, save_user_config(cfg)


def check_strict() -> list[str]:
    """Strict validation (reference: dbtwiz/config/loader.py
    validate_configs): report every problem in config.toml instead of
    silently degrading to defaults — TOML syntax, unknown keys, and
    invalid values. Returns a list of error strings (empty = valid)."""
    p = config_path()
    if not p.exists():
        return []
    errors: list[str] = []
    try:
        data = tomllib.loads(p.read_text())
    except tomllib.TOMLDecodeError as e:
        return [f"invalid TOML in {p}: {e}"]
    known = {f.name for f in fields(UserConfig)}
    for k in sorted(set(data) - known):
        errors.append(f"unknown setting {k!r} in {p}")
    try:
        cfg = UserConfig(**{k: v for k, v in data.items() if k in known})
        cfg.validate()
    except (TypeError, ValueError) as e:
        errors.append(f"invalid value in {p}: {e}")
    return errors


def describe() -> list[tuple[str, object, str]]:
    cfg = load_user_config()
    return [
        (f.name, getattr(cfg, f.name), f.metadata.get("help", ""))
        for f in fields(cfg)
    ]
