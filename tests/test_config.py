"""Config schema parity tests (reference: src/config/config.cpp:23-52)."""

import json

import pytest

from slam_indoor_code_tpu.config import (
    REFERENCE_SCHEMA,
    Config,
    ConfigError,
    dump_config,
    load_config,
    parse_config,
)


def _full_config_dict():
    vals = {}
    for key, typ in REFERENCE_SCHEMA.items():
        vals[key] = {bool: True, int: 7, float: 0.5, str: "x"}[typ]
    return vals


def test_schema_has_all_reference_fields():
    # The exact 40 keys from configData.h:73-126.
    assert len(REFERENCE_SCHEMA) == 40
    for key in ("useFM-SIFT-FLANN", "RPRANSACProb", "BAUseTukeyLossFunction",
                "TriangleMinimumPoints", "knnMatcherDistance"):
        assert key in REFERENCE_SCHEMA


def test_parse_full_config_roundtrip(tmp_path):
    raw = _full_config_dict()
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(str(p))
    assert cfg.RPRANSACProb == 0.5
    assert cfg.useFM_SIFT_FLANN is True
    # round-trip preserves reference keys
    dumped = json.loads(dump_config(cfg))
    for key in REFERENCE_SCHEMA:
        assert key in dumped


def test_missing_field_rejected_strict():
    raw = _full_config_dict()
    del raw["BAMaxFramesCnt"]
    with pytest.raises(ConfigError, match="BAMaxFramesCnt"):
        parse_config(json.dumps(raw))


def test_wrong_type_rejected():
    raw = _full_config_dict()
    raw["framesBatchSize"] = "thirty"
    with pytest.raises(ConfigError, match="framesBatchSize"):
        parse_config(json.dumps(raw))


def test_int_accepts_integral_float_like_nlohmann():
    raw = _full_config_dict()
    raw["framesBatchSize"] = 30.0
    cfg = parse_config(json.dumps(raw))
    assert cfg.framesBatchSize == 30


def test_json_comments_accepted():
    # reference parses with ignore_comments=true (config.cpp:13)
    raw = _full_config_dict()
    text = json.dumps(raw)
    text = "// leading comment\n" + text + "\n/* trailing */"
    cfg = parse_config(text)
    assert cfg.threadsCount == 7


def test_matcher_priority_order():
    # SIFT_BF beats SIFT_FLANN beats ORB (featureMatchingCommon.cpp:13-21)
    cfg = Config(useFM_SIFT_BF=True, useFM_SIFT_FLANN=True, useFM_ORB=True)
    assert cfg.matcher_type == "sift_bf"
    cfg = Config(useFM_SIFT_BF=False, useFM_SIFT_FLANN=True, useFM_ORB=True)
    assert cfg.matcher_type == "sift_flann"
    cfg = Config(useFM_SIFT_BF=False, useFM_SIFT_FLANN=False, useFM_ORB=True)
    assert cfg.matcher_type == "orb_bf"
    assert cfg.descriptor_kind == "orb"
    assert cfg.match_metric == "hamming"


def test_ba_loss_priority_order():
    # trivial > huber > cauchy > arctan > tukey (bundleAdjustment.cpp:131-151)
    cfg = Config(BAUseTrivialLossFunction=True, BAUseHuberLossFunction=True)
    assert cfg.ba_loss == ("trivial", 1.0)
    cfg = Config(BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.5)
    assert cfg.ba_loss == ("huber", 2.5)
    cfg = Config(BAUseHuberLossFunction=False, BAUseCauchyLossFunction=True,
                 BACauchyLossFunctionParameter=0.3)
    assert cfg.ba_loss == ("cauchy", 0.3)
