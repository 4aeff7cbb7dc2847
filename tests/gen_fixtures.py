"""Deterministic generator for the reference-domain CSV fixtures.

Follows FIXTURES.md §A: same columns, same edge cases (dirty body
numbers that collide after normalization, M/D/YYYY realization dates that
the regex dispatch must NULL out, ''→NULL corridors, trim-sensitive dim
keys, F-status rows that the P2 filter must drop), at the reference's
volumes (515 bus / 900 halte / 515 realisasi / 21 routes / 74 shelters).
Seeded — every call produces byte-identical files.
"""

from __future__ import annotations

import csv
import os
import random
import uuid
from datetime import datetime, timedelta

ROUTE_CODES = [str(i) for i in range(1, 15)] + ["B21", "C12", "D11", "F11", "K22", "L13", "M14"]
RUTE_REALISASI = ["B21", "C12", "D11", "F11", "K22", "L13", "M14"]
CARD_TYPES = ["BRIZZI", "JakCard", "E-Money", "Flazz"]
FARES = [0, 2000, 3500, 20000, 35000]
GATE_LITERALS = ["True", "False", "T", "F", "1", "0", "Y", "N", "YES", "NO", ""]
PLACES = [
    "Blok M", "Kota", "Pulo Gadung", "Harmoni", "Kalideres", "Ragunan",
    "Kampung Melayu", "Ancol", "Grogol", "Tanjung Priok", "Cililitan",
    "Pinang Ranti", "Pluit", "Tosari", "Dukuh Atas", "Senen", "Juanda",
    "Bundaran HI", "Monas", "Sawah Besar", "Glodok", "Mangga Besar",
]

_BODY_PREFIXES = ["KLG", "LGS", "BRT", "TJX", "MYS", "DMR", "PPD", "SAF"]
_BODY_SUFFIXES = ["", "", "", "", "-", "_A", "A", "-B", "_B", "--"]


def _body_pool(rng: random.Random, n: int) -> list[str]:
    """Dirty body numbers; collisions after norm are guaranteed because
    digit runs longer than 3 truncate (KLG4590 and KLG4591 → KLG-459)."""
    pool = []
    for _ in range(n):
        pre = rng.choice(_BODY_PREFIXES)
        # mix of 2-4 digit runs: 4-digit runs collide after truncation
        ndig = rng.choice([2, 3, 3, 4, 4, 4])
        digits = "".join(rng.choice("0123456789") for _ in range(ndig))
        pool.append(pre + digits + rng.choice(_BODY_SUFFIXES))
    return pool


def _write(path: str, header: list[str], rows: list[list]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def generate(data_dir: str, seed: int = 42) -> None:
    rng = random.Random(seed)

    # routes (21)
    routes = []
    used_names = set()
    for code in ROUTE_CODES:
        a, b = rng.sample(PLACES, 2)
        name = f"{a} - {b}"
        while name in used_names:
            a, b = rng.sample(PLACES, 2)
            name = f"{a} - {b}"
        used_names.add(name)
        routes.append([code, name])
    _write(os.path.join(data_dir, "dummy_routes.csv"), ["route_code", "route_name"], routes)

    # shelter_corridor (74) — unique names, some '' corridors, stray spaces
    shelters = []
    shelter_names = []
    for i in range(74):
        base = f"{rng.choice(PLACES)} {i+1:02d}"
        shelter_names.append(base)
        staged = base if rng.random() > 0.15 else f"  {base} "
        code = "" if rng.random() < 0.08 else str(rng.randint(1, 14))
        corridor_name = f"{rng.choice(PLACES)} - {rng.choice(PLACES)}"
        shelters.append([staged, code, corridor_name])
    _write(
        os.path.join(data_dir, "dummy_shelter_corridor.csv"),
        ["shelter_name_var", "corridor_code", "corridor_name"],
        shelters,
    )

    # realisasi_bus (515) — bodies that the bus fixtures will reuse
    bodies = _body_pool(rng, 515)
    realisasi = []
    for i, body in enumerate(bodies):
        r = rng.random()
        if r < 0.90:  # M/D/YYYY single-digit month → must load as NULL
            d = f"{rng.randint(7, 9)}/{rng.randint(1, 28)}/2025"
        elif r < 0.95:  # ISO → parses
            d = f"2025-07-{rng.randint(1, 28):02d}"
        else:  # DD/MM/YYYY → parses
            d = f"{rng.randint(1, 28):02d}/07/2025"
        realisasi.append([d, body, rng.choice(RUTE_REALISASI)])
    _write(
        os.path.join(data_dir, "dummy_realisasi_bus.csv"),
        ["tanggal_realisasi", "bus_body_no", "rute_realisasi"],
        realisasi,
    )

    def _trx_common(i: int, day: int) -> dict:
        ts = datetime(2025, 7, day, rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59))
        fare = rng.choice(FARES)
        before = rng.randint(fare, fare + 100000)
        return {
            "uuid": str(uuid.UUID(int=rng.getrandbits(128))),
            "waktu": ts.strftime("%Y-%m-%d %H:%M:%S"),
            "card_no": "".join(rng.choice("0123456789") for _ in range(16)),
            "card_type": rng.choice(CARD_TYPES),
            "before": before,
            "fare": fare,
            "after": before - fare,
            "tx": f"TX{i+1:06d}",
            "gate": rng.choice(GATE_LITERALS),
            "lat": -6.3 + rng.random() * 0.2,
            "lon": 106.7 + rng.random() * 0.2,
            "status": "S" if rng.random() < 0.95 else "F",
            "free": "True" if rng.random() < 0.12 else "False",
            "ins": (ts + timedelta(seconds=rng.randint(0, 120))).strftime("%Y-%m-%d %H:%M:%S"),
        }

    # transaksi_bus (515) — bodies drawn from the realisasi pool so every
    # normalized body matches (ref match rate 100%)
    bus_rows = []
    for i in range(515):
        c = _trx_common(i, rng.randint(1, 31))
        body = rng.choice(bodies)
        plate = f"B {rng.randint(1000, 9999)} {''.join(rng.choice('ABCDEFGHJKLMNPRSTUVWXYZ') for _ in range(3))}"
        bus_rows.append([
            c["uuid"], c["waktu"], plate, body, c["card_no"], c["card_type"],
            c["before"], c["fare"], c["after"], c["tx"], c["gate"],
            c["lat"], c["lon"], c["status"], c["free"], c["ins"],
        ])
    _write(
        os.path.join(data_dir, "dummy_transaksi_bus.csv"),
        ["uuid", "waktu_transaksi", "armada_id_var", "no_body_var",
         "card_number_var", "card_type_var", "balance_before_int", "fare_int",
         "balance_after_int", "transcode_txt", "gate_in_boo", "p_latitude_flo",
         "p_longitude_flo", "status_var", "free_service_boo", "insert_on_dtm"],
        bus_rows,
    )

    # transaksi_halte (900) — shelter names drawn 100% from the dim domain
    halte_rows = []
    for i in range(900):
        c = _trx_common(i, rng.randint(1, 31))
        shelter = rng.choice(shelter_names)
        terminal = f"Gate {rng.randint(1, 3)} {shelter}"
        halte_rows.append([
            c["uuid"], c["waktu"], shelter, terminal, c["card_no"], c["card_type"],
            c["before"], c["fare"], c["after"], c["tx"], c["gate"],
            c["lat"], c["lon"], c["status"], c["free"], c["ins"],
        ])
    _write(
        os.path.join(data_dir, "dummy_transaksi_halte.csv"),
        ["uuid", "waktu_transaksi", "shelter_name_var", "terminal_name_var",
         "card_number_var", "card_type_var", "balance_before_int", "fare_int",
         "balance_after_int", "transcode_txt", "gate_in_boo", "p_latitude_flo",
         "p_longitude_flo", "status_var", "free_service_boo", "insert_on_dtm"],
        halte_rows,
    )
