"""Unit tests for the pure normalization functions (SURVEY §5.3)."""

from ocds_entity_extract_ray.functions import laundry
from ocds_entity_extract_ray.functions.classify import (
    build_classifier_list_from_text,
    classify_party,
    get_entity_classifier,
)
from ocds_entity_extract_ray.functions.geo import (
    get_country_name,
    get_other_state_names,
    get_state_id,
)
from ocds_entity_extract_ray.functions.products import get_product_id, strip_dots
from ocds_entity_extract_ray.functions.textextract import (
    extract_jsonld_blocks,
    extract_text_one,
)


def test_simple_name():
    assert laundry.simple_name("Secretaría de Salud") == "secretaria-de-salud"
    assert laundry.simple_name("  MX ") == "mx"
    assert laundry.simple_name("Ciudad. de (México)!") == "ciudad-de-mexico"
    assert laundry.simple_name(None) == ""
    assert laundry.simple_name("ÁÉÍÓÚÑü") == "aeiounu"


def test_launder():
    assert laundry.launder("Comercializadora   'Ñandú', S.A.") == "COMERCIALIZADORA NANDU SA"
    assert laundry.launder(None) == ""


def test_company_type_and_is_company():
    assert laundry.company_type("ACME S.A. DE C.V.") == "sa-de-cv"
    assert laundry.company_type("ACME S. DE R.L. DE C.V.") == "s-de-rl-de-cv"
    assert laundry.company_type("ACME S.A.P.I. DE C.V.") == "sapi-de-cv"
    assert laundry.company_type("JUAN PEREZ LOPEZ") == ""
    assert laundry.is_company("DISTRIBUIDORA OMEGA S.A. DE C.V.")
    assert laundry.is_company("GRUPO FARMACEUTICO AZTECA")  # keyword arm
    assert not laundry.is_company("MARIA GARCIA HERNANDEZ")
    assert not laundry.is_company(None)


def test_clean_country():
    assert laundry.clean_country("México") == "MX"
    assert laundry.clean_country("mx") == "MX"
    assert laundry.clean_country("Estados Unidos") == "US"
    assert laundry.clean_country("España") == "ES"
    assert laundry.clean_country(None) == ""


def test_get_state_id_reference_corners():
    # faithful corner: unknown MX region -> 'mx-' (extract.js:1002-1100)
    assert get_state_id({"region": "Atlantis"}, "MX") == "mx-"
    assert get_state_id({"region": "Jalisco"}, "MX") == "mx-jal"
    assert get_state_id({"region": "Estado de México"}, "MX") == "mx-mex"
    assert get_state_id({"region": "Coahuila de Zaragoza"}, "MX") == "mx-coa"
    # non-MX: slugified region
    assert get_state_id({"region": "Texas"}, "US") == "us-texas"
    assert get_state_id({}, "MX") == ""


def test_country_name_and_aliases():
    assert get_country_name("MX") == "México"
    assert get_country_name("ZZ") == "ZZ"  # default: echo (extract.js:1465)
    assert get_other_state_names("Coahuila") == ["Coahuila de Zaragoza"]
    assert get_other_state_names("Jalisco") is None


def test_get_product_id():
    assert get_product_id("010.000.0501.00") == "010.000.0501.00"
    assert get_product_id("010000050100") == "010.000.0501.00"
    assert get_product_id("12345") == "12345"  # short: pass through
    assert get_product_id("") == ""
    assert get_product_id(None) == ""
    # dot at position 0 does NOT count (indexOf('.') > 0)
    assert get_product_id(".23456789012") == ".23.456.7890.12"
    assert strip_dots("010.000.0501.00") == "010000050100"


def test_classifier_list():
    csv_a = '"ACME  CO",company\n"JOHN   DOE",person\n'
    csv_b = '"ACME  CO",person\n'
    lst = build_classifier_list_from_text([csv_a, csv_b])
    # keys whitespace-collapsed; later files override (classify.js)
    assert lst["ACME CO"] == "person"
    assert lst["JOHN DOE"] == "person"
    assert get_entity_classifier("ACME CO", lst) is False
    assert get_entity_classifier("UNSEEN", lst) is None


def test_classify_party_cascade():
    lst = {"LISTED PERSON SA": "person"}
    # institution short-circuits
    assert classify_party({"details": {"type": "institution"}, "name": "X SA"}, lst) == "institution"
    # classifier list beats heuristic
    assert classify_party({"details": {}, "name": "LISTED PERSON SA"}, lst) == "person"
    # details.type=company overrides the list result
    assert (
        classify_party({"details": {"type": "company"}, "name": "LISTED PERSON SA"}, lst)
        == "company"
    )
    # fallback heuristic
    assert classify_party({"details": {}, "name": "ACME S.A. DE C.V."}, None) == "company"
    assert classify_party({"details": {}, "name": "JUAN PEREZ"}, None) == "person"


def test_extract_text_deterministic_and_clean():
    html = (
        b"<html><head><title>T&iacute;tulo</title>"
        b'<script type="application/ld+json">{"a": 1}</script>'
        b"<style>p{color:red}</style></head>"
        b"<body><!-- c --><p>Hola  <b>mundo</b> &amp; m&aacute;s</p></body></html>"
    )
    t1 = extract_text_one(html)
    t2 = extract_text_one(html)
    assert t1 == t2 == "Título Hola mundo & más"
    assert extract_jsonld_blocks(html) == ['{"a": 1}']


def test_extract_text_invalid_utf8():
    assert extract_text_one(b"<p>ok\xff</p>") == "ok�"
