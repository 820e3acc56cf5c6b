"""Label CSV loader behavior (header aliasing, ips, broken rows, discovery)."""

from __future__ import annotations

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
