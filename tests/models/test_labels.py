"""Label CSV loader behavior (header aliasing, ips, broken rows, discovery)."""

from __future__ import annotations

import pytest

from kobato_eyes_tpu.models.base import TagCategory
from kobato_eyes_tpu.models.labels import (
    BROKEN_PLACEHOLDER_PREFIX,
    discover_labels_csv,
    labels_by_popularity,
    load_labels,
    parse_category,
)


def test_load_labels_aliases_and_ips(tmp_path):
    csv_path = tmp_path / "selected_tags.csv"
    csv_path.write_text(
        "tag_id,name,category,count,ips\n"
        '1,1girl,general,5000000,\n'
        '2,some_character,4,1200,"[""some_franchise""]"\n'
        "3,some_franchise,copyright,3000,\n"
        "4,,9,0,\n"  # broken: empty name
        "5,rating_safe,rating,10,\n"
    )
    labels = load_labels(csv_path)
    assert len(labels) == 5
    assert labels[0].name == "1girl" and labels[0].category == TagCategory.GENERAL
    assert labels[1].category == TagCategory.CHARACTER
    assert labels[1].ips == ("some_franchise",)
    assert labels[2].category == TagCategory.COPYRIGHT
    assert labels[3].name.startswith(BROKEN_PLACEHOLDER_PREFIX)
    assert labels[4].category == TagCategory.RATING


def test_parse_category_variants():
    assert parse_category("GENERAL") == TagCategory.GENERAL
    assert parse_category("4") == TagCategory.CHARACTER
    assert parse_category(3) == TagCategory.COPYRIGHT
    assert parse_category(None) == TagCategory.GENERAL
    assert parse_category("not_a_cat") == TagCategory.GENERAL


def test_discovery_and_popularity(tmp_path):
    model = tmp_path / "model.ckpt"
    model.touch()
    (tmp_path / "selected_tags.csv").write_text("name,category,count\nb,general,1\na,general,9\n")
    found = discover_labels_csv(model)
    assert found is not None and found.name == "selected_tags.csv"
    labels = load_labels(found)
    pop = labels_by_popularity(labels)
    assert [m.name for m in pop] == ["a", "b"]


def test_verify_label_order_match_and_repair(tmp_path):
    """tag_map JSON is the authority on label order (reference
    pixai_onnx.py:109-167): matching order passes through, a shuffled table
    is repaired with categories rebuilt by name and placeholders for gaps."""
    import json

    from kobato_eyes_tpu.models.base import TagCategory
    from kobato_eyes_tpu.models.labels import (
        BROKEN_PLACEHOLDER_PREFIX,
        TagMeta,
        verify_label_order,
    )

    labels = [
        TagMeta("alpha", TagCategory.GENERAL, count=5),
        TagMeta("beta", TagCategory.CHARACTER, count=3, ips=("copy",)),
        TagMeta("gamma", TagCategory.COPYRIGHT, count=1),
    ]
    jp = tmp_path / "tags_v0.9_13k.json"
    jp.write_text(json.dumps({"tag_map": {"alpha": 0, "beta": 1, "gamma": 2}}))
    same, fixed = verify_label_order(labels, jp)
    assert fixed == 0 and same is labels

    # shuffled: JSON says beta is index 0; index 2 missing -> placeholder
    jp.write_text(json.dumps({"tag_map": {"beta": 0, "alpha": 1}}))
    repaired, fixed = verify_label_order(labels, jp)
    assert fixed == 3
    assert [m.name for m in repaired] == ["beta", "alpha", f"{BROKEN_PLACEHOLDER_PREFIX}2"]
    assert repaired[0].category == TagCategory.CHARACTER and repaired[0].ips == ("copy",)
    assert repaired[1].category == TagCategory.GENERAL
    assert repaired[2].category == TagCategory.GENERAL  # unknown -> GENERAL fallback


def test_pixai_tagger_repairs_label_order(tmp_path):
    """PixaiTagger discovers the tag_map JSON next to the labels CSV and
    serves predictions under the JSON's order."""
    import json

    from kobato_eyes_tpu.models.labels import load_labels
    from kobato_eyes_tpu.models.tagger import PixaiTagger

    csv = tmp_path / "selected_tags.csv"
    csv.write_text("name,category\nwrong_first,0\nwrong_second,4\n")
    (tmp_path / "tags_v0.9_13k.json").write_text(
        json.dumps({"tag_map": {"wrong_second": 0, "wrong_first": 1}})
    )
    tagger = PixaiTagger(labels_path=csv, image_size=16, preset="tiny",
                         vit=None, arch="vit")
    assert [m.name for m in tagger.labels] == ["wrong_second", "wrong_first"]
    # categories moved with the names
    assert int(tagger.labels[0].category) == 4


def test_broken_rows_get_placeholders_and_bad_fields_degrade(tmp_path):
    """Nameless rows become __broken placeholders at their ordinal (label
    order is positional for the model head); bad count/ips degrade to
    defaults instead of failing the load (reference labels_util.py:133)."""
    p = tmp_path / "selected_tags.csv"
    p.write_text(
        "tag_id,name,category,count,ips\n"
        "1,girl,0,not_a_number,\n"
        "2,,0,5,\n"  # nameless -> placeholder
        '3,hat,4,12,"not json"\n'
        '4,mascot,4,3,"[""seriesA"", """"]"\n'
    )
    labels = load_labels(p)
    assert [m.name.startswith("__") for m in labels] == [False, True, False, False]
    assert labels[0].count == 0  # unparsable count degrades
    assert labels[2].ips == ()  # unparsable ips degrades
    assert labels[3].ips == ("seriesA",)  # empties filtered


def test_headerless_csv_rejected(tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(ValueError, match="no header"):
        load_labels(p)


def test_pixai_tag_map_env_discovery(tmp_path, monkeypatch):
    from kobato_eyes_tpu.models.labels import discover_tag_map_json

    model = tmp_path / "model.ckpt"
    model.touch()
    assert discover_tag_map_json(model) is None
    custom = tmp_path / "elsewhere.json"
    custom.write_text("{}")
    monkeypatch.setenv("KET_PIXAI_TAGS_JSON", str(custom))
    assert discover_tag_map_json(model) == custom
