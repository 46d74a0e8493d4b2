import pytest

from sketchformer_tpu.utils.hparams import HParams
from sketchformer_tpu.utils.registry import Registry


def test_parse_overrides_types():
    hps = HParams(d_model=256, dropout=0.1, name="x", flag=False, buckets=[32, 64])
    hps.parse("d_model=512,dropout=0.0,flag=true,name=y,buckets=16;32;48")
    assert hps.d_model == 512 and isinstance(hps.d_model, int)
    assert hps.dropout == 0.0
    assert hps.flag is True
    assert hps.name == "y"
    assert hps.buckets == [16, 32, 48]


def test_unknown_key_rejected():
    hps = HParams(a=1)
    with pytest.raises(AttributeError):
        hps.parse("b=2")
    with pytest.raises(AttributeError):
        hps.b = 2


def test_override_and_merge():
    base = HParams(a=1, b=2)
    new = base.override(b=3)
    assert base.b == 2 and new.b == 3
    merged = base.merge(HParams(b=9, c=10))
    assert merged.values() == {"a": 1, "b": 9, "c": 10}


def test_json_roundtrip(tmp_path):
    hps = HParams(a=1, b=0.5, c="s", d=True)
    p = str(tmp_path / "hp.json")
    hps.save(p)
    assert HParams.load(p) == hps


def test_registry():
    reg = Registry("widget")

    @reg.register("w1")
    class W1:
        pass

    assert reg.get("w1") is W1
    assert "w1" in reg
    with pytest.raises(KeyError):
        reg.get("nope")
    with pytest.raises(KeyError):
        reg.register("w1")(W1)
