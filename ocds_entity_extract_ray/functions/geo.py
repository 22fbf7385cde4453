"""Static geographic lookup tables + id rules.

Re-expresses the reference's hardcoded switch statements as dicts:
- MX region name -> ISO-3166-2:MX 3-letter code (/root/reference/lib/extract.js:1002-1100)
- ISO-2 country code -> Spanish country name (/root/reference/lib/extract.js:1384-1467)
- MX state alias expansions (/root/reference/lib/extract.js:991-1000)
All pure scalar functions.
"""

from __future__ import annotations

from .laundry import simple_name

# MX region display name -> ISO-3166-2:MX code (extract.js:1006-1091,
# including every accent/alias variant the reference matches).
MX_STATE_IDS: dict[str, str] = {
    "Aguascalientes": "agu",
    "Baja California": "bcn",
    "Baja California Sur": "bcs",
    "Campeche": "cam",
    "Chiapas": "chp",
    "Chihuahua": "chh",
    "Ciudad de México": "cmx",
    "Ciudad de Mexico": "cmx",
    "Coahuila": "coa",
    "Coahuila de Zaragoza": "coa",
    "Colima": "col",
    "Durango": "dur",
    "Guerrero": "gro",
    "Guanajuato": "gua",
    "Hidalgo": "hid",
    "Jalisco": "jal",
    "Mexico": "mex",
    "México": "mex",
    "Estado de México": "mex",
    "Estado de Mexico": "mex",
    "Michoacan de Ocampo": "mic",
    "Michoacán de Ocampo": "mic",
    "Michoacán": "mic",
    "Michoacan": "mic",
    "Morelos": "mor",
    "Nayarit": "nay",
    "Nuevo León": "nle",
    "Nuevo Leon": "nle",
    "Oaxaca": "oax",
    "Puebla": "pue",
    "Querétaro": "que",
    "Quintana Roo": "roo",
    "San Luis Potosi": "slp",
    "San Luis Potosí": "slp",
    "Sinaloa": "sin",
    "Sonora": "son",
    "Tabasco": "tab",
    "Tamaulipas": "tam",
    "Tlaxcala": "tla",
    "Veracruz": "ver",
    "Veracruz de Ignacio de la Llave": "ver",
    "Yucatan": "yuc",
    "Yucatán": "yuc",
    "Zacatecas": "zac",
}

# MX state alias expansions (extract.js:991-1000).
OTHER_STATE_NAMES: dict[str, list[str]] = {
    "Coahuila": ["Coahuila de Zaragoza"],
    "Estado de México": ["México"],
    "Michoacán": ["Michoacán de Ocampo"],
    "Veracruz": ["Veracruz de Ignacio de la Llave"],
}

# ISO-2 -> Spanish country name (extract.js:1384-1467); default = echo code.
COUNTRY_NAMES: dict[str, str] = {
    "AD": "Andorra", "AE": "Emiratos Árabes Unidos", "AM": "Armenia",
    "AR": "Argentina", "AT": "Austria", "AU": "Australia", "BE": "Bélgica",
    "BG": "Bulgaria", "BM": "Bermudas", "BR": "Brasil", "CA": "Canadá",
    "CH": "Suiza", "CL": "Chile", "CN": "China", "CO": "Colombia",
    "CR": "Costa Rica", "CU": "Cuba", "CZ": "República Checa",
    "DE": "Alemania", "DK": "Dinamarca", "DO": "República Dominicana",
    "DZ": "Argelia", "EC": "Ecuador", "EE": "Estonia", "EG": "Egipto",
    "ES": "España", "FI": "Finlandia", "FR": "Francia", "GB": "Reino Unido",
    "GE": "Georgia", "GR": "Grecia", "GT": "Guatemala", "HK": "Hong Kong",
    "HR": "Croacia", "HU": "Hungría", "IE": "Irlanda", "IL": "Israel",
    "IN": "India", "IO": "Territorio Británico del Océano Índico",
    "IS": "Islandia", "IT": "Italia", "JP": "Japón", "KE": "Kenya",
    "KR": "República de Corea", "LB": "Líbano", "LR": "Liberia",
    "LT": "Lituania", "MD": "Moldavia", "MT": "Malta", "MX": "México",
    "MY": "Malasia", "NG": "Nigeria", "NL": "Países Bajos", "NO": "Noruega",
    "NZ": "Nueva Zelanda", "PA": "Panamá", "PE": "Perú", "PL": "Polonia",
    "PR": "Puerto Rico", "PT": "Portugal", "RE": "Reunión", "RS": "Serbia",
    "RU": "Rusia", "SE": "Suecia", "SG": "Singapur", "SI": "Eslovenia",
    "SL": "Sierra Leona", "SV": "El Salvador", "SZ": "Swazilandia",
    "TR": "Turquía", "TW": "Taiwan", "UA": "Ucrania", "UG": "Uganda",
    "US": "Estados Unidos", "UY": "Uruguay", "VE": "Venezuela",
    "VI": "Islas Vírgenes de los Estados Unidos", "YT": "Mayotte",
    "ZA": "Sudáfrica",
}


def get_country_name(code: str | None) -> str:
    """ISO-2 code -> Spanish name; unknowns echo the code (extract.js:1465)."""
    if code is None:
        return ""
    return COUNTRY_NAMES.get(code, code)


def get_other_state_names(state: str | None) -> list[str] | None:
    return OTHER_STATE_NAMES.get(state) if state else None


def get_state_id(address: dict, country: str) -> str:
    """Region -> '<country-slug>-<code-or-slug>' (extract.js:1002-1100).

    Faithful corner: an MX region missing from the table keeps the empty
    code, yielding 'mx-' (the reference's exact behavior)."""
    sid = ""
    if not address or address.get("region") is None:
        return sid
    region = address["region"]
    if country == "MX":
        sid = MX_STATE_IDS.get(region, "")
    else:
        sid = simple_name(region)
    return simple_name(country) + "-" + sid
