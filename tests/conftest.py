"""Shared fixtures: one SparkSession for the whole run (startup is
~50 s in this container), tmp zone dirs, reference-shaped synthetic
inputs (FIXTURES.md §1-§3), and offline fetch fakes."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dpe_energy_performance_analysis_etl_spark import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture()
def zones(tmp_path, monkeypatch):
    monkeypatch.setenv("ENGINE_DATA_ROOT", str(tmp_path / "data"))
    from dpe_energy_performance_analysis_etl_spark.config import EngineConfig

    return EngineConfig()


@pytest.fixture(scope="session")
def enedis_csv(tmp_path_factory):
    """`;`-separated Enedis-shaped input (FIXTURES.md §1)."""
    path = tmp_path_factory.mktemp("input") / "enedis.csv"
    header = (
        "annee;code_iris;nom_iris;numero_de_voie;type_de_voie;libelle_de_voie;"
        "code_commune;nom_commune;segment_de_client;nombre_de_logements;"
        "consommation_annuelle_totale_de_l_adresse_mwh;"
        "consommation_annuelle_moyenne_par_site_de_l_adresse_mwh;"
        "adresse;code_departement;tri_des_adresses"
    )
    rows = [
        f"2022;0602901{i:02d};La Source;{10+i};RUE;LACOUR;06029;Cannes;RESIDENTIEL;"
        f"{50+i};{70.5+i};{1.1+0.01*i};{10+i} RUE LACOUR;06;{60000+i}"
        for i in range(8)
    ] + [
        f"2022;7511204{i:02d};Odeon;{i+1};RUE;SEINE;75112;Paris;RESIDENTIEL;"
        f"{30+i};{50.25+i};{0.9+0.01*i};{i+1} RUE SEINE;75;{70000+i}"
        for i in range(4)
    ]
    path.write_text(header + "\n" + "\n".join(rows) + "\n")
    return str(path)


@pytest.fixture(scope="session")
def fake_fetch_ban():
    """Deterministic geocoder fake: one BAN record per address."""

    def fetch(addr: str) -> list[dict]:
        key = abs(hash(addr)) % 10_000
        return [
            {
                "id_ban": f"ban_{key}",
                "label": addr.lower(),
                "lon": 7.0 + key / 10_000,
                "lat": 43.5 + key / 10_000,
                "city": addr.split(" ")[-1],
                "citycode": addr.split(" ")[-2],
                "postcode": addr.split(" ")[-2],
                "score": 0.9,
            }
        ]

    return fetch


@pytest.fixture(scope="session")
def fake_fetch_ademe():
    """Deterministic DPE fake: 2 dwelling records per BAN id (1→N)."""

    def fetch(id_ban: str) -> list[dict]:
        n = int(id_ban.split("_")[1])
        return [
            {
                "_id": f"dpe_{n}_{j}",
                "identifiant_ban": id_ban,
                "etiquette_dpe": "ABCDEFG"[(n + j) % 7],
                "etiquette_ges": "ABCDEFG"[(n + 2 * j) % 7],
                "conso_5_usages_par_m2_ef": 80.0 + (n % 50) + j,
                "conso_5_usages_par_m2_ep": 120.0 + (n % 70) + j,
                "surface_habitable_logement": float(20 + (n + j) % 80),
                "annee_construction": float(1950 + n % 70),
                "periode_construction": "1948-1974",
                "code_postal_ban": "06400" if n % 2 == 0 else "75006",
                "zone_climatique": "H3" if n % 2 == 0 else "H1a",
                "statut_geocodage": "adresse geocodee",
                "date_etablissement_dpe": "2022-05-item",
            }
            for j in range(2)
        ]

    return fetch
