"""Config CLI override tests (utils/config.py).

Covers the round-2 fix: a `task_cfg.*` override must materialize the
*selected task's* default config, not a bare TaskConfig (whose defaults are
kick's) — cf. /root/reference/bez_isaacgym/cfg task->task_cfg pairing via
the Hydra defaults list (cfg/config.yaml:46-49).
"""

import pytest

from bez_isaacgym_tpu.utils.config import RunConfig, parse_overrides
from bez_isaacgym_tpu.tasks.registry import default_configs


def test_basic_overrides():
    cfg = parse_overrides(["task=bez_walk", "num_envs=128", "seed=7",
                           "test=true", "train.horizon=16"])
    assert cfg.task == "bez_walk"
    assert cfg.num_envs == 128 and cfg.seed == 7 and cfg.test is True
    assert cfg.train.horizon == 16


def test_task_cfg_override_uses_selected_task_defaults():
    walk_default = default_configs["bez_walk"]()
    cfg = parse_overrides(["task=bez_walk", "task_cfg.dr.enabled=true"])
    tc = cfg.resolved_task_cfg()
    assert tc.dr.enabled is True
    # walk's own defaults survive (10 s episodes, (2,0) goal), not kick's.
    assert tc.episode_length_s == walk_default.episode_length_s
    assert tc.goal == walk_default.goal


def test_task_cfg_override_order_independent():
    # task= after task_cfg.* must still seed from the walk defaults.
    cfg = parse_overrides(["task_cfg.dr.enabled=true", "task=bez_walk"])
    tc = cfg.resolved_task_cfg()
    assert tc.dr.enabled is True
    assert tc.episode_length_s == default_configs["bez_walk"]().episode_length_s


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        parse_overrides(["nonsense_key=1"])
    with pytest.raises(ValueError):
        parse_overrides(["no_equals_sign"])


def test_resolved_task_cfg_defaults():
    cfg = RunConfig(task="bez_orient")
    assert cfg.resolved_task_cfg() == default_configs["bez_orient"]()
