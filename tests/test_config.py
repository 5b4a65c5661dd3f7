import textwrap

from cvpytorch_tpu.config import (
    CommonConfiguration,
    Configuration,
    dictionary_to_names_weights,
    load_dictionary,
)


def test_attribute_access_and_nesting():
    cfg = Configuration({"A": 1, "B": {"C": 2, "D": {"E": 3}}})
    assert cfg.A == 1
    assert cfg.B.C == 2
    assert cfg.B.D.E == 3
    cfg.B.C = 5
    assert cfg["B"]["C"] == 5


def test_recursive_update():
    cfg = Configuration({"A": {"X": 1, "Y": 2}})
    cfg.update({"A": {"Y": 3, "Z": 4}, "B": 9})
    assert cfg.A.X == 1 and cfg.A.Y == 3 and cfg.A.Z == 4 and cfg.B == 9


def test_missing_key_returns_none():
    cfg = CommonConfiguration({"PRESENT": 1})
    assert cfg.PRESENT == 1
    assert cfg.PRETRAIN_MODEL is None  # soft-miss semantics
    assert cfg.get("NOPE", "dflt") == "dflt"


def test_nested_soft_miss():
    cfg = CommonConfiguration({"USE_MODEL": {"CLASS": "x"}})
    assert cfg.USE_MODEL.CLASS == "x"
    assert cfg.USE_MODEL.BACKBONE is None


def test_from_yaml(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(textwrap.dedent("""
        EXPERIMENT_NAME: demo
        DATASET:
          CLASS: src.data.datasets.coco.CocoDetection
          TRAIN:
            IMG_DIR: /data
    """))
    cfg = CommonConfiguration.from_yaml(str(p))
    assert cfg.EXPERIMENT_NAME == "demo"
    assert cfg.DATASET.TRAIN.IMG_DIR == "/data"
    assert cfg.DATASET.VAL is None


def test_dictionary_yaml(tmp_path):
    p = tmp_path / "d.yml"
    p.write_text("SEG_CLASSES:\n  - road: 1.0\n  - car: 2.5\n")
    task, classes = load_dictionary(str(p))
    assert task == "SEG_CLASSES"
    names, weights = dictionary_to_names_weights(classes)
    assert names == ["road", "car"]
    assert weights == [1.0, 2.5]


def test_clone_is_deep():
    cfg = CommonConfiguration({"A": {"B": 1}})
    c2 = cfg.clone()
    c2.A.B = 2
    assert cfg.A.B == 1
