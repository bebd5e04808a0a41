"""Golden-oracle generator: converts the `no_oracle` rows-only queries into
hash-verified driver rows.

For each query that DuckDB cannot express directly (binary fixtures, kernel
hashes, ANN operating points), this script computes the EXPECTED result with
an independent driver-side implementation (plain numpy / pure Python — no
Spark) and writes it to ``golden/<query>.parquet``. The paired
``oracle_sql()`` entry is then a plain ``SELECT`` over the committed golden
file, which DuckDB hashes like any other oracle.

Independence notes (what each golden actually cross-checks):
- q23: brute-force ALL-PAIRS Hamming join over a from-scratch pure-Python
  FNV-1a simhash — independently validates both the Arrow simhash kernel
  and the pigeonhole-banded join (different algorithm, same spec).
- q24/q41: numpy reimplementation of sign-LSH / IVF at the pinned operating
  point (same published algorithm, independent code) — validates the
  distributed bucketing, probing and exact re-scoring.
- q31: features computed from the SOURCE pixel arrays — the golden never
  calls the PNG decoder, so agreement proves encode→decode fidelity.
- q44/q48: numpy zonal / gather over the driver-decoded real GeoTIFF
  (decode itself is cross-validated against the .ovr overview in
  tests/test_geotiff.py) — validates the distributed kernels end-to-end
  on the reference's own binary inputs.
- q30/q49: same cell-index kernels invoked driver-side (pins Spark-side
  drift; the kernels' own correctness is covered by structural-invariant
  tests in tests/test_s2.py / tests/test_h3.py).

Run:  python tools/make_golden.py     (writes golden/*.parquet, ~1 min)
The sf-dependent goldens (q23, q24, q30, q41) are pinned to the driver's
correctness scale factor, sf0.01.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "golden")
SF_DIR = "/root/testdata/sf0.01"
TIF = "/root/reference/data/apg18e_1_0_0_20210512.tif"


def _write(name: str, df: pd.DataFrame) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    df.to_parquet(path, index=False)
    print(f"{name}: {len(df)} rows -> {path}")


def _docs_pdf() -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()


def _emb_matrix() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float32) for v in t["embedding"]])
    return ids, m


# --------------------------------------------------------------------------
# q23 — FNV simhash near-dup pairs, brute force all-pairs
# --------------------------------------------------------------------------

def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for tok in toks:
        h = _fnv1a64(tok.encode("utf-8"))
        for bi in range(64):
            votes[bi] += 1 if (h >> bi) & 1 else -1
    out = 0
    for bi in range(64):
        if votes[bi] > 0:
            out |= 1 << bi
    return out


def golden_q23(ham_max: int = 8) -> pd.DataFrame:
    d = _docs_pdf()
    sigs = {int(i): _simhash64(t)
            for i, t in zip(d["doc_id"], d["text"])}
    ids = sorted(sigs)
    rows = []
    for a_i, ida in enumerate(ids):
        sa = sigs[ida]
        for idb in ids[a_i + 1:]:
            ham = bin(sa ^ sigs[idb]).count("1")
            if ham <= ham_max:
                rows.append((ida, idb, ham))
    return pd.DataFrame(rows, columns=["id1", "id2", "ham"]).astype(
        {"id1": "int64", "id2": "int64", "ham": "int64"})


# --------------------------------------------------------------------------
# q24 / q41 — ANN at the pinned operating points (numpy reimplementation)
# --------------------------------------------------------------------------

QUANT = 1000


def _quant_cosine(m: np.ndarray, q: np.ndarray):
    """Exactly the engine's quantized-cosine arithmetic:
    (dot / sqrt(n2)) / sqrt(qn2), every operand an exact integer."""
    mi = np.floor(m.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    qi = np.floor(q.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    dot = (mi * qi[None, :]).sum(axis=1).astype(np.float64)
    n2 = (mi * mi).sum(axis=1).astype(np.float64)
    qn2 = float((qi * qi).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dot / np.sqrt(n2) / np.sqrt(qn2)
    return np.where(n2 > 0, cos, np.nan), n2


def _topk(ids: np.ndarray, cos: np.ndarray, n2: np.ndarray, k: int
          ) -> pd.DataFrame:
    keep = n2 > 0
    ids, cos = ids[keep], cos[keep]
    order = np.lexsort((ids, -cos))[:k]
    return pd.DataFrame({"vec_id": ids[order].astype("int64"),
                         "cosine": cos[order].astype("float64")})


def golden_q24(k: int = 10, n_planes: int = 8, dim: int = 64,
               seed: int = 42, n_tables: int = 1,
               query_id: int = 0) -> pd.DataFrame:
    ids, m = _emb_matrix()
    q = m[ids == query_id][0].astype(np.float64)
    md = m.astype(np.float64)
    cand = np.zeros(len(ids), dtype=bool)
    for t in range(n_tables):
        rng = np.random.default_rng(seed + t)
        planes = rng.standard_normal((n_planes, dim))
        w = 1 << np.arange(n_planes)
        buckets = (((md @ planes.T) >= 0) * w).sum(axis=1)
        qb = int(((q @ planes.T >= 0) * w).sum())
        cand |= buckets == qb
    cos, n2 = _quant_cosine(m[cand], q)
    return _topk(ids[cand], cos, n2, k)


def golden_q41(k: int = 10, n_lists: int = 8, n_probe: int = 6,
               seed: int = 42, query_id: int = 0) -> pd.DataFrame:
    ids, m = _emb_matrix()
    vectors = m.astype(np.float64)      # same float64 sample as the engine
    # Lloyd's k-means, deterministic seed/init/iteration (the published
    # IVF recipe; mirrors the engine's arithmetic op-for-op)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(vectors), size=min(n_lists, len(vectors)),
                     replace=False)
    cents = vectors[idx].copy()
    for _ in range(10):
        d = ((vectors[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = vectors[mask].mean(axis=0)
    q = vectors[ids == query_id][0]
    dq = ((cents - q[None, :]) ** 2).sum(axis=1)
    probes = set(int(i) for i in np.argsort(dq)[:n_probe])
    # distributed assignment arithmetic: argmin(c·c − 2 v·c)
    c2 = (cents * cents).sum(axis=1)
    alist = np.argmin(c2[None, :] - 2.0 * (vectors @ cents.T), axis=1)
    cand = np.array([int(a) in probes for a in alist])
    cos, n2 = _quant_cosine(m[cand], q)
    return _topk(ids[cand], cos, n2, k)


# --------------------------------------------------------------------------
# q30 — S2 cells (driver-side kernel invocation)
# --------------------------------------------------------------------------

def golden_q30() -> pd.DataFrame:
    from air_health_gis_tools_spark import geo_synth as G
    from air_health_gis_tools_spark.functions.s2 import (planar_to_latlng,
                                                         s2_cell_np)
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    x, y = G.point_xy_np(ids)
    lat, lng = planar_to_latlng(x, y)
    return pd.DataFrame({
        "doc_id": ids,
        "cell_s2_10": s2_cell_np(lat, lng, 10).astype("int64"),
        "cell_s2_14": s2_cell_np(lat, lng, 14).astype("int64")})


# --------------------------------------------------------------------------
# q31 — multimodal features from SOURCE arrays (never decodes)
# --------------------------------------------------------------------------

def golden_q31(n: int = 200) -> pd.DataFrame:
    from air_health_gis_tools_spark.operators.multimodal import (
        audio_feature, image_feature, media_audio_samples,
        media_image_array, media_row, media_video_planes, video_feature)
    agg: dict[str, list] = {}
    for i in range(n):
        mid, kind, payload, w, h, _ = media_row(i)
        if kind == "image":
            feat0 = image_feature(media_image_array(i, w, h))[0]
        elif kind == "audio":
            # SOURCE samples — the WAV decoder is never invoked here, so
            # q31's hash proves wav_encode→wav_decode fidelity
            feat0 = audio_feature(media_audio_samples(i))[0]
        else:
            # SOURCE planes — the Y4M decoder is never invoked here, so
            # q31's hash proves y4m_encode→y4m_decode fidelity (r4)
            feat0 = video_feature(*media_video_planes(i))[0]
        f0q = int(np.floor(np.float64(feat0) * 1024 + 0.5))
        a = agg.setdefault(kind, [0, 0, 0])
        a[0] += 1
        a[1] += len(payload)
        a[2] += f0q
    return pd.DataFrame(
        [(k, v[0], v[1], v[2]) for k, v in sorted(agg.items())],
        columns=["kind", "n", "total_bytes", "sum_feat0"]).astype(
        {"n": "int64", "total_bytes": "int64", "sum_feat0": "int64"})


# --------------------------------------------------------------------------
# q44 / q48 — real-raster zonal / RDS gather (numpy oracle)
# --------------------------------------------------------------------------

def golden_q44() -> pd.DataFrame:
    from air_health_gis_tools_spark.operators.zonal import (circle_offsets,
                                                            radius_px)
    from air_health_gis_tools_spark.sources.geotiff import read_geotiff
    arr, info = read_geotiff(TIF)
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    cols = 16 + (ids * 48271 + 11) % (info.width - 32)
    rows = 16 + (ids * 16807 + 23) % (info.height - 32)
    x = cols * 1000 + 137
    y = rows * 1000 + 500
    out = {"doc_id": ids, "x": x, "y": y}
    for b in (700, 1000, 10000):
        dr, dc = circle_offsets(radius_px(b))
        vals = arr[rows[:, None] + dr[None, :], cols[:, None] + dc[None, :]]
        valid = ~np.isnan(vals)
        cnt = valid.sum(axis=1)
        s = np.where(valid, vals, 0.0).sum(axis=1)
        has = cnt > 0
        out[f"mean_{b}"] = np.where(has, s / np.maximum(cnt, 1), np.nan)
        out[f"min_{b}"] = np.where(
            has, np.where(valid, vals, np.inf).min(axis=1), np.nan)
        out[f"max_{b}"] = np.where(
            has, np.where(valid, vals, -np.inf).max(axis=1), np.nan)
        out[f"n_valid_{b}"] = cnt.astype("int64")
    return pd.DataFrame(out)


def golden_q48() -> pd.DataFrame:
    from air_health_gis_tools_spark.sources.geotiff import (read_geotiff,
                                                            rowcol_of_xy)
    from air_health_gis_tools_spark.sources.rds import rds_to_pandas
    arr, info = read_geotiff(TIF)
    pts = rds_to_pandas("/root/reference/data/grids/testing_points.rds")
    rows, cols = rowcol_of_xy(info, pts["X"].to_numpy(),
                              pts["Y"].to_numpy())
    keep = ((rows >= 0) & (rows < info.height)
            & (cols >= 0) & (cols < info.width))
    return pd.DataFrame({
        "fid": pts["FID"].to_numpy(np.int64)[keep],
        "popdens": arr[rows[keep], cols[keep]].astype("float64")})


def golden_q49() -> pd.DataFrame:
    """H3 cells driver-side (same kernel, pins Spark-side drift; kernel
    correctness is covered by structural invariants in tests/test_h3.py)."""
    from air_health_gis_tools_spark import geo_synth as G
    from air_health_gis_tools_spark.functions.h3 import (cell_to_parent,
                                                         latlng_to_cell)
    from air_health_gis_tools_spark.functions.s2 import planar_to_latlng
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    x, y = G.point_xy_np(ids)
    lat, lng = planar_to_latlng(x, y)
    c9 = latlng_to_cell(lat, lng, 9)
    return pd.DataFrame({
        "doc_id": ids,
        "cell_h3_7": latlng_to_cell(lat, lng, 7),
        "cell_h3_8": latlng_to_cell(lat, lng, 8),
        "cell_h3_9": c9,
        "parent7_of_9": cell_to_parent(c9, 7)})


def golden_q50() -> pd.DataFrame:
    """Reference srg-dev two-CRS workflow, replayed driver-side with the
    same public Snyder/Helmert equations + the order-stable zonal
    expressions (validates the DISTRIBUTED 9473->3577 kernel + zonal)."""
    from air_health_gis_tools_spark.functions.crs import (
        epsg3577_to_epsg9473, epsg9473_to_epsg3577)
    from air_health_gis_tools_spark.operators.zonal import (circle_offsets,
                                                            radius_px)
    from air_health_gis_tools_spark.sources.geotiff import read_geotiff
    from air_health_gis_tools_spark.sources.rds import rds_to_pandas
    arr, info = read_geotiff(TIF)
    pts = rds_to_pandas(
        "/root/reference/data/grids/NSW_points_1km.rds").iloc[::3510]
    gx, gy = epsg3577_to_epsg9473(pts["x"].to_numpy(),
                                  pts["y"].to_numpy())
    x94, y94 = epsg9473_to_epsg3577(gx, gy)
    x0, xres, y0, yres = info.transform
    col = np.floor((x94 - x0) / xres).astype(np.int64)
    row = np.floor((y94 - y0) / yres).astype(np.int64)
    keep = ((row >= 1) & (row < info.height - 1)
            & (col >= 1) & (col < info.width - 1))
    fid = pts["FID"].to_numpy(np.int64)[keep]
    row, col = row[keep], col[keep]
    dr, dc = circle_offsets(radius_px(700))
    vals = arr[row[:, None] + dr[None, :], col[:, None] + dc[None, :]]
    valid = ~np.isnan(vals)
    cnt = valid.sum(axis=1)
    s = np.where(valid, vals, 0.0).sum(axis=1)
    has = cnt > 0
    return pd.DataFrame({
        "fid": fid, "row": row, "col": col,
        "mean_700": np.where(has, s / np.maximum(cnt, 1), np.nan),
        "min_700": np.where(
            has, np.where(valid, vals, np.inf).min(axis=1), np.nan),
        "max_700": np.where(
            has, np.where(valid, vals, -np.inf).max(axis=1), np.nan),
        "n_valid_700": cnt.astype("int64")})


def golden_q51() -> pd.DataFrame:
    """Geocode -> Albers -> pixel gather chain, driver-side replay."""
    from air_health_gis_tools_spark import geo_synth as G
    from air_health_gis_tools_spark.functions.crs import albers_forward
    from air_health_gis_tools_spark.functions.s2 import planar_to_latlng
    from air_health_gis_tools_spark.sources.geotiff import read_geotiff
    arr, info = read_geotiff(TIF)
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    x, y = G.point_xy_np(ids)
    lat, lng = planar_to_latlng(x, y)
    lat = -44.0 + (lat + 25.0) * 0.5
    lng = 140.0 + (lng + 25.0) * 0.25
    ax, ay = albers_forward(lat, lng)
    x0, xres, y0, yres = info.transform
    col = np.floor((ax - x0) / xres).astype(np.int64)
    row = np.floor((ay - y0) / yres).astype(np.int64)
    inb = ((row >= 0) & (row < info.height)
           & (col >= 0) & (col < info.width))
    v = np.full(len(row), np.nan)
    v[inb] = arr[row[inb], col[inb]]
    return pd.DataFrame({"doc_id": ids, "row": row, "col": col,
                         "popdens": v})


def golden_q52() -> pd.DataFrame:
    """H3 k-ring smoothing driver-side: same kernels, pandas groupby."""
    from air_health_gis_tools_spark import geo_synth as G
    from air_health_gis_tools_spark.functions.h3 import (grid_disk,
                                                         latlng_to_cell)
    from air_health_gis_tools_spark.functions.s2 import planar_to_latlng
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    x, y = G.point_xy_np(ids)
    lat, lng = planar_to_latlng(x, y)
    cells = latlng_to_cell(lat, lng, 5)
    uniq, counts = np.unique(cells, return_counts=True)
    cmap = dict(zip((int(u) for u in uniq), (int(c) for c in counts)))
    rows = []
    for u in uniq:
        ring = sum(cmap.get(int(m), 0) for m in grid_disk(int(u), 1))
        rows.append((int(u), cmap[int(u)], ring))
    return pd.DataFrame(rows,
                        columns=["cell_h3_5", "n_docs", "n_ring"]).astype(
        {"cell_h3_5": "int64", "n_docs": "int64", "n_ring": "int64"})


class _StdlibExtractor:
    """HTML→text per the functions/html_text.py contract, implemented on
    stdlib ``html.parser.HTMLParser`` (event-driven tokenizer — a different
    algorithm from the engine's regex scanner; ``convert_charrefs=True``
    gives per-text-node WHATWG entity decoding, matching contract rule 4)."""

    def extract(self, doc: str) -> str:
        import re
        from html.parser import HTMLParser
        from air_health_gis_tools_spark.functions.html_text import BLOCK_TAGS

        parts: list[str] = []
        raw_depth = 0          # inside script/style/template: drop content

        class _P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                nonlocal raw_depth
                if tag in ("script", "style", "template"):
                    raw_depth += 1
                if tag in BLOCK_TAGS:
                    parts.append("\n")

            def handle_endtag(self, tag):
                nonlocal raw_depth
                if tag in ("script", "style", "template"):
                    raw_depth = max(0, raw_depth - 1)
                if tag in BLOCK_TAGS:
                    parts.append("\n")

            def handle_startendtag(self, tag, attrs):
                if tag in BLOCK_TAGS:
                    parts.append("\n")

            def handle_data(self, data):
                if not raw_depth:
                    parts.append(data)

        p = _P(convert_charrefs=True)
        p.feed(doc)
        p.close()
        joined = "".join(parts)
        return re.sub(r"[ \t\r\n\f\v]+",
                      lambda m: "\n" if "\n" in m.group(0) else " ",
                      joined).strip(" \t\r\n\f\v")


def golden_q54() -> pd.DataFrame:
    """Pages-fixture extraction replayed with the stdlib-HTMLParser
    implementation — validates the engine's regex tokenizer byte-for-byte
    (both against each other and against the fixture's text column)."""
    from air_health_gis_tools_spark.plans.queries import N_PAGES_Q54
    from air_health_gis_tools_spark.sources.pages import _gen_pages
    pdf = next(_gen_pages([pd.DataFrame(
        {"id": np.arange(N_PAGES_Q54, dtype=np.int64)})]))
    ex = _StdlibExtractor()
    extracted = [ex.extract(h.decode("utf-8", "replace"))
                 for h in pdf["html"]]
    return pd.DataFrame({
        "page_id": np.arange(N_PAGES_Q54, dtype=np.int64),
        "url": pdf["url"],
        "extracted": extracted,
        "byte_identical": np.asarray(
            [int(e == t) for e, t in zip(extracted, pdf["text"])],
            dtype=np.int32),
        "n_chars": np.asarray([len(e) for e in extracted], dtype=np.int32),
    })


def golden_q59(k: int = 10, n_lists: int = 8, n_probe: int = 6,
               m: int = 8, ksub: int = 16, refine: int = 64,
               seed: int = 42, query_id: int = 0) -> pd.DataFrame:
    """Independent numpy replay of IVF-PQ at the pinned operating point:
    coarse k-means prune, per-subspace PQ codebooks + codes, ADC
    shortlist of ``refine`` (ties by id), exact quantized-cosine top-k of
    the shortlist — same published algorithm, separate code path."""
    ids, mx = _emb_matrix()
    vectors = mx.astype(np.float64)
    # coarse quantizer (identical recipe to golden_q41)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(vectors), size=min(n_lists, len(vectors)),
                     replace=False)
    cents = vectors[idx].copy()
    for _ in range(10):
        d = ((vectors[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = vectors[mask].mean(axis=0)
    q = vectors[ids == query_id][0]
    probes = set(int(i) for i in np.argsort(
        ((cents - q[None, :]) ** 2).sum(axis=1))[:n_probe])
    c2 = (cents * cents).sum(axis=1)
    alist = np.argmin(c2[None, :] - 2.0 * (vectors @ cents.T), axis=1)
    cand = np.array([int(a) in probes for a in alist])
    # PQ codebooks (engine seed 7) + codes + ADC over candidates
    dim = vectors.shape[1]
    dsub = dim // m
    rng2 = np.random.default_rng(7)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = vectors[:, j * dsub:(j + 1) * dsub]
        i2 = rng2.choice(len(vectors), size=min(ksub, len(vectors)),
                         replace=False)
        bc = sub[i2].copy()
        for _ in range(10):
            d = ((sub[:, None, :] - bc[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for c in range(len(bc)):
                mask = a == c
                if mask.any():
                    bc[c] = sub[mask].mean(axis=0)
        books[j] = bc
    b2 = (books * books).sum(axis=2)
    codes = np.empty((len(vectors), m), dtype=np.int64)
    for j in range(m):
        sub = vectors[:, j * dsub:(j + 1) * dsub]
        codes[:, j] = np.argmin(b2[j][None, :] - 2.0 * (sub @ books[j].T),
                                axis=1)
    lut = np.stack([((books[j] - q[j * dsub:(j + 1) * dsub][None, :]) ** 2
                     ).sum(axis=1) for j in range(m)])
    adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
    cidx = np.where(cand)[0]
    order = sorted(cidx, key=lambda i: (adc[i], ids[i]))
    short = np.array(order[:refine], dtype=np.int64)
    cos, n2 = _quant_cosine(mx[short], q)
    return _topk(ids[short], cos, n2, k)


def _geohash_scalar(lat: float, lng: float, precision: int) -> str:
    """Independent scalar geohash (character-at-a-time interval walk — a
    different shape from the engine's vectorized bit matrix)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_i, lng_i = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        iv = lng_i if even else lat_i
        v = lng if even else lat
        mid = (iv[0] + iv[1]) / 2.0
        ch <<= 1
        if v >= mid:
            ch |= 1
            iv[0] = mid
        else:
            iv[1] = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(b32[ch])
            bit, ch = 0, 0
    return "".join(out)


def golden_q61() -> pd.DataFrame:
    from air_health_gis_tools_spark import geo_synth as G
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    x, y = G.point_xy_np(ids)
    lat = (y.astype(np.float64) - 2_000_000.0) / 100_000.0
    lng = (x.astype(np.float64) - 2_000_000.0) / 100_000.0
    gh5 = [_geohash_scalar(a, b, 5) for a, b in zip(lat, lng)]
    gh9 = [_geohash_scalar(a, b, 9) for a, b in zip(lat, lng)]
    return pd.DataFrame({
        "doc_id": ids, "gh5": gh5, "gh9": gh9,
        "is_prefix": np.asarray(
            [int(g9[:5] == g5) for g5, g9 in zip(gh5, gh9)],
            dtype=np.int32)})


def golden_q55() -> pd.DataFrame:
    """Expected WARC-ingest rows straight from the page generator — never
    touches the WARC codec, gzip layer, HTTP splitter or either HTML
    tokenizer, so q55's hash proves that whole chain end-to-end. The HTTP
    block size is recomputed here from the message grammar."""
    from air_health_gis_tools_spark.plans.queries import N_PAGES_Q55
    from air_health_gis_tools_spark.sources.pages import _gen_pages
    pdf = next(_gen_pages([pd.DataFrame(
        {"id": np.arange(N_PAGES_Q55, dtype=np.int64)})]))
    n_bytes = []
    for h in pdf["html"]:
        head = (f"HTTP/1.1 200 OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(h)}\r\n\r\n")
        n_bytes.append(len(head) + len(h))
    return pd.DataFrame({
        "page_id": np.arange(N_PAGES_Q55, dtype=np.int64),
        "url": pdf["url"],
        "warc_ts": pdf["warc_ts"],
        "http_status": np.full(N_PAGES_Q55, 200, dtype=np.int32),
        "n_bytes": np.asarray(n_bytes, dtype=np.int64),
        "extracted": pdf["text"],   # fixture html wraps text verbatim
    })


def golden_q66() -> pd.DataFrame:
    """Overview-pyramid stats from the driver-side numpy decode (corner
    subsample per level) — never touches the distributed tile scan,
    overview shuffle or partial aggregation, so q66's hash checks that
    whole chain."""
    from air_health_gis_tools_spark.sources.geotiff import read_geotiff
    full, _ = read_geotiff(TIF)
    rows = []
    for lvl in (1, 2, 3):
        sub = full[0::2 ** lvl, 0::2 ** lvl]
        v = sub[~np.isnan(sub)]
        rows.append((lvl, len(v),
                     int(np.floor(v * 16.0 + 0.5).astype(np.int64).sum())))
    return pd.DataFrame(rows, columns=["level", "n_valid", "sum_q"]).astype(
        {"level": "int32", "n_valid": "int64", "sum_q": "int64"})


def golden_q67(iters: int = 10) -> pd.DataFrame:
    """Independent numpy replay of the exact fixed-point PageRank: same
    integer recurrence, np.add.at accumulation instead of a shuffle."""
    SCALE = 1_000_000_000_000
    d = _docs_pdf()
    ids = d["doc_id"].to_numpy(np.int64)
    n = len(ids)
    srcs = np.concatenate([ids, ids, ids])
    dsts = np.concatenate([(ids * 7 + 1) % n, (ids * 13 + 5) % n,
                           (ids * 31 + 11) % n])
    base = (100 - 85) * SCALE // 100 // n
    rank = np.full(n, SCALE // n, dtype=np.int64)
    for _ in range(iters):
        contrib = rank[srcs] // 3
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dsts, contrib)
        rank = base + (85 * acc) // 100
    return pd.DataFrame({"doc_id": ids, "rank_fp": rank})


# --------------------------------------------------------------------------
# q84 — SemDeDup semantic dedup (cluster-local exact-integer near-dup)
# --------------------------------------------------------------------------

def golden_q84(n_lists: int = 8, tau_num: int = 9, tau_den: int = 20,
               seed: int = 42) -> pd.DataFrame:
    """Independent replay of operators/semdedup.semantic_dedup: Lloyd's
    k-means (same deterministic recipe golden_q41 mirrors), nearest-
    centroid assignment, then brute-force within-cluster pairs under the
    exact-integer predicate dot > 0 and dot²·den² ≥ num²·n1·n2 — keep = 0
    iff a lower-id near-dup exists in the cluster."""
    ids, m = _emb_matrix()
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    vectors = m.astype(np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(vectors), size=min(n_lists, len(vectors)),
                     replace=False)
    cents = vectors[idx].copy()
    for _ in range(10):
        d = ((vectors[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = vectors[mask].mean(axis=0)
    c2 = (cents * cents).sum(axis=1)
    cluster = np.argmin(c2[None, :] - 2.0 * (vectors @ cents.T), axis=1)
    qm = np.floor(m.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    n2 = (qm * qm).sum(axis=1)
    n_nbrs = {int(i): 0 for i in ids}
    dropped = {int(i): 0 for i in ids}
    for c in range(n_lists):
        members = np.where(cluster == c)[0]
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                u, v = members[ai], members[bi]
                dot = int((qm[u] * qm[v]).sum())
                if dot > 0 and (dot * dot * tau_den * tau_den
                                >= tau_num * tau_num
                                * int(n2[u]) * int(n2[v])):
                    lo, hi = ((u, v) if ids[u] < ids[v] else (v, u))
                    n_nbrs[int(ids[u])] += 1
                    n_nbrs[int(ids[v])] += 1
                    dropped[int(ids[hi])] = 1
    return pd.DataFrame({
        "vec_id": ids.astype("int64"),
        "cluster": cluster.astype("int64"),
        "n_nbrs": np.array([n_nbrs[int(i)] for i in ids], dtype="int64"),
        "keep": np.array([1 - dropped[int(i)] for i in ids],
                         dtype="int64")})


def golden_q94(n_merges: int = 64, sample_n: int = 256) -> pd.DataFrame:
    """BPE token stats driver-side: same pure-Python/NumPy kernels as the
    distributed apply (q49's pattern — pins Spark-side drift; the BPE
    algorithm itself is pinned by hand-computed cases in tests/test_bpe.py
    — merge order, tie-breaks, end-of-word handling)."""
    from air_health_gis_tools_spark.operators.bpe import (bpe_tokenize_np,
                                                          bpe_train_merges)
    d = _docs_pdf().sort_values("doc_id").reset_index(drop=True)
    merges = bpe_train_merges(d["text"].tolist()[:sample_n], n_merges)
    n_tok, n_dist = bpe_tokenize_np(d["text"].to_numpy(), merges)
    comp = (d["n_chars"].to_numpy(np.int64) * 1_000_000) // n_tok
    return pd.DataFrame({
        "doc_id": d["doc_id"].to_numpy(np.int64),
        "n_bpe_tokens": n_tok,
        "n_bpe_distinct": n_dist,
        "compression_ppm": comp})


ALL = {
    "q23_simhash_nn": golden_q23,
    "q24_ann_lsh": golden_q24,
    "q30_s2_cells": golden_q30,
    "q31_multimodal_features": golden_q31,
    "q41_ann_ivf": golden_q41,
    "q44_real_raster_zonal": golden_q44,
    "q48_rds_point_sample": golden_q48,
    "q49_h3_cells": golden_q49,
    "q50_two_crs_focal": golden_q50,
    "q51_geocode_crs_pixel": golden_q51,
    "q52_h3_kring_smooth": golden_q52,
    "q54_html_extract": golden_q54,
    "q55_warc_ingest": golden_q55,
    "q59_ann_ivfpq": golden_q59,
    "q61_geohash_cells": golden_q61,
    "q66_overview_pyramid": golden_q66,
    "q67_pagerank": golden_q67,
    "q84_semantic_dedup": golden_q84,
    "q94_bpe_tokenize": golden_q94,
}


def main(only: list[str] | None = None) -> None:
    for name, fn in ALL.items():
        if only and name not in only:
            continue
        _write(name, fn())


if __name__ == "__main__":
    main(sys.argv[1:] or None)
