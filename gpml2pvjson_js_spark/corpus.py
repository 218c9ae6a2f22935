"""Deterministic synthetic corpus of Common-Crawl-style pages embedding
GPML pathway-XML fragments.

Input-table shape per BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Fixture taxonomy mirrors the reference golden corpus
(/root/reference/test/expected/, see FIXTURES.md): one-node,
data-nodes, interactions, groups, states, hyperedges (anchors),
publication-xrefs, vocabularies, shapes/labels, empty, multi-fragment
pages, negative (no-GPML) pages, and giant pages for skew testing.

Generation is distributed: `pages_df` maps a `spark.range` through a
pandas batch generator, so a 10^8-row corpus never materializes on the
driver. Content is a pure function of the row index + seed (no wall
clock, no RNG state shared across partitions).
"""

from __future__ import annotations

import datetime as _dt
import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GPML_NS = "http://pathvisio.org/GPML/2013a"
BP_NS = "http://www.biopax.org/release/biopax-level3.owl#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_EPOCH = _dt.datetime(2020, 1, 6, 0, 0, 0)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _pathway_open(name="test case", version="20140130", organism=None,
                  license_=None, board_w=160.0, board_h=205.0,
                  comments=()):
    attrs = f'xmlns="{GPML_NS}" Name="{name}" Version="{version}"'
    if organism:
        attrs += f' Organism="{organism}"'
    if license_:
        attrs += f' License="{license_}"'
    out = [f"<Pathway {attrs}>"]
    for source, content in comments:
        src = f' Source="{source}"' if source else ""
        out.append(f"  <Comment{src}>{content}</Comment>")
    out.append(
        f'  <Graphics BoardWidth="{board_w}" BoardHeight="{board_h}" />'
    )
    return "\n".join(out)


def _datanode(graph_id, label, wp_type="GeneProduct", cx=90.0, cy=165.0,
              w=80.0, h=20.0, zorder=32768, font_size=10, valign="Middle",
              xref=None, group_ref=None, biopax_refs=()):
    gr = f' GroupRef="{group_ref}"' if group_ref else ""
    gid = f' GraphId="{graph_id}"' if graph_id else ""
    lines = [f'  <DataNode TextLabel="{label}"{gid} Type="{wp_type}"{gr}>']
    for ref in biopax_refs:
        lines.append(f"    <BiopaxRef>{ref}</BiopaxRef>")
    lines.append(
        f'    <Graphics CenterX="{cx}" CenterY="{cy}" Width="{w}" '
        f'Height="{h}" ZOrder="{zorder}" FontSize="{font_size}" '
        f'Valign="{valign}" />'
    )
    db, id_ = xref if xref else ("", "")
    lines.append(f'    <Xref Database="{db}" ID="{id_}" />')
    lines.append("  </DataNode>")
    return "\n".join(lines)


def _shape(graph_id, cx, cy, w, h, shape_type="Oval", zorder=16384,
           rotation=None, cellular_component=None, text_label=None):
    tl = f' TextLabel="{text_label}"' if text_label else ""
    lines = [f'  <Shape GraphId="{graph_id}"{tl}>']
    if cellular_component:
        lines.append(
            '    <Attribute Key="org.pathvisio.CellularComponentProperty" '
            f'Value="{cellular_component}" />'
        )
    rot = f' Rotation="{rotation}"' if rotation is not None else ""
    lines.append(
        f'    <Graphics CenterX="{cx}" CenterY="{cy}" Width="{w}" '
        f'Height="{h}" ZOrder="{zorder}"{rot} />'
    )
    lines.append("  </Shape>")
    return "\n".join(lines)


def _label(graph_id, text, cx, cy, w=90.0, h=25.0, zorder=28672, href=None):
    hr = f' Href="{href}"' if href else ""
    return (
        f'  <Label TextLabel="{text}" GraphId="{graph_id}"{hr}>\n'
        f'    <Graphics CenterX="{cx}" CenterY="{cy}" Width="{w}" '
        f'Height="{h}" ZOrder="{zorder}" />\n'
        f"  </Label>"
    )


def _state(graph_id, graph_ref, label="P", rel_x=1.0, rel_y=-1.0,
           w=15.0, h=15.0, shape_type="Oval"):
    return (
        f'  <State GraphRef="{graph_ref}" TextLabel="{label}" '
        f'GraphId="{graph_id}">\n'
        f'    <Graphics RelX="{rel_x}" RelY="{rel_y}" Width="{w}" '
        f'Height="{h}" ShapeType="{shape_type}" />\n'
        f'    <Xref Database="" ID="" />\n'
        f"  </State>"
    )


def _point(x, y, graph_ref=None, rel_x=None, rel_y=None, arrow_head=None):
    a = f'X="{x}" Y="{y}"'
    if graph_ref:
        a += f' GraphRef="{graph_ref}"'
    if rel_x is not None:
        a += f' RelX="{rel_x}" RelY="{rel_y}"'
    if arrow_head:
        a += f' ArrowHead="{arrow_head}"'
    return f'      <Point {a} />'


def _interaction(graph_id, points, anchors=(), zorder=12288,
                 connector_type=None, group_ref=None, element="Interaction"):
    gr = f' GroupRef="{group_ref}"' if group_ref else ""
    gid = f' GraphId="{graph_id}"' if graph_id else ""
    ct = f' ConnectorType="{connector_type}"' if connector_type else ""
    lines = [f"  <{element}{gid}{gr}>",
             f'    <Graphics ZOrder="{zorder}" LineThickness="1.0"{ct}>']
    lines.extend(points)
    for anchor_id, position, shape in anchors:
        aid = f' GraphId="{anchor_id}"' if anchor_id else ""
        shp = f' Shape="{shape}"' if shape else ""
        lines.append(f'      <Anchor Position="{position}"{shp}{aid} />')
    lines.append("    </Graphics>")
    if element == "Interaction":
        lines.append('    <Xref Database="" ID="" />')
    lines.append(f"  </{element}>")
    return "\n".join(lines)


def _group(group_id, graph_id=None, style=None):
    gid = f' GraphId="{graph_id}"' if graph_id else ""
    sty = f' Style="{style}"' if style else ""
    return f'  <Group GroupId="{group_id}"{gid}{sty} />'


def _biopax(publication_xrefs=(), vocabularies=()):
    if not publication_xrefs and not vocabularies:
        return ""
    dt = f'rdf:datatype="http://www.w3.org/2001/XMLSchema#string"'
    lines = [f'  <Biopax xmlns:bp="{BP_NS}" xmlns:rdf="{RDF_NS}">']
    for p in publication_xrefs:
        # NOTE: lowercase rdf:id reproduces the known GPML2013a spelling
        # bug repaired by the rdf:ID fixup stage
        # (ref: src/2013a/toPvjson.ts:163-167).
        lines.append(f'    <bp:PublicationXref rdf:id="{p["id"]}">')
        for key in ("ID", "DB", "TITLE", "SOURCE", "YEAR"):
            if p.get(key) is not None:
                lines.append(
                    f'      <bp:{key} {dt}>{p[key]}</bp:{key}>'
                )
        for author in p.get("AUTHORS", ()):
            lines.append(f'      <bp:AUTHORS {dt}>{author}</bp:AUTHORS>')
        lines.append("    </bp:PublicationXref>")
    for v in vocabularies:
        lines.append("    <bp:openControlledVocabulary>")
        lines.append(f'      <bp:TERM {dt}>{v["term"]}</bp:TERM>')
        lines.append(f'      <bp:ID {dt}>{v["id"]}</bp:ID>')
        lines.append(f'      <bp:Ontology {dt}>{v["ontology"]}</bp:Ontology>')
        lines.append("    </bp:openControlledVocabulary>")
    lines.append("  </Biopax>")
    return "\n".join(lines)


def _doc(*parts):
    body = "\n".join(p for p in parts if p)
    return f'<?xml version="1.0" encoding="UTF-8"?>\n{body}\n</Pathway>'


# ---------------------------------------------------------------------------
# Fixture classes
# ---------------------------------------------------------------------------

def gpml_one_node():
    """Replica of the reference `one-node` fixture input
    (derived from /root/reference/test/expected/one-node.json)."""
    return _doc(
        _pathway_open(name="test case", version="20140130",
                      board_w=160.0, board_h=205.0),
        _datanode("d6efe", "GeneProduct", "GeneProduct"),
    )


def gpml_data_nodes():
    nodes = []
    specs = [
        ("dn001", "TP53", "GeneProduct", ("Entrez Gene", "7157")),
        ("dn002", "ATP", "Metabolite", ("CAS", "56-65-5")),
        ("dn003", "AKT1", "Protein", ("Uniprot-TrEMBL", "P31749")),
        ("dn004", "MIR21", "Rna", ("Ensembl", "ENSG00000284190")),
        ("dn005", "Apoptosis", "Pathway", ("WikiPathways", "WP254")),
        ("dn006", "mystery", "Unknown", None),
    ]
    for i, (gid, label, wp_type, xref) in enumerate(specs):
        nodes.append(_datanode(gid, label, wp_type, cx=100.0 + 120.0 * i,
                               cy=100.0, zorder=32768 + i, xref=xref))
    return _doc(
        _pathway_open(name="data nodes (fixture)", organism="Homo sapiens",
                      board_w=900.0, board_h=300.0),
        *nodes,
    )


def gpml_interactions():
    """Straight edges with assorted markers between typed DataNodes."""
    parts = [
        _datanode("ia001", "EGF", "Protein", cx=100.0, cy=100.0,
                  xref=("Entrez Gene", "1950")),
        _datanode("ia002", "EGFR", "Protein", cx=100.0, cy=300.0,
                  zorder=32769, xref=("Entrez Gene", "1956")),
        _datanode("ia003", "Glucose", "Metabolite", cx=300.0, cy=100.0,
                  zorder=32770, xref=("CAS", "50-99-7")),
        _datanode("ia004", "G6P", "Metabolite", cx=300.0, cy=300.0,
                  zorder=32771, xref=("CAS", "56-73-5")),
        _datanode("ia005", "HK1", "GeneProduct", cx=500.0, cy=200.0,
                  zorder=32772, xref=("Entrez Gene", "3098")),
        _datanode("ia006", "BAX", "GeneProduct", cx=700.0, cy=100.0,
                  zorder=32773, xref=("Entrez Gene", "581")),
        _datanode("ia007", "BCL2", "GeneProduct", cx=700.0, cy=300.0,
                  zorder=32774, xref=("Entrez Gene", "596")),
        # plain arrow protein->protein => re-disambiguated to mim-conversion
        _interaction("ie001", [
            _point(100.0, 110.0, "ia001", 0.0, 1.0),
            _point(100.0, 290.0, "ia002", 0.0, -1.0, "Arrow"),
        ]),
        # metabolite conversion with an anchor for catalysis below
        _interaction("ie002", [
            _point(300.0, 110.0, "ia003", 0.0, 1.0),
            _point(300.0, 290.0, "ia004", 0.0, -1.0, "mim-conversion"),
        ], anchors=(("ianch1", 0.4, "None"),), zorder=12289),
        # catalysis: HK1 -> anchor on ie002
        _interaction("ie003", [
            _point(460.0, 200.0, "ia005", -1.0, 0.0),
            _point(300.0, 182.0, "ianch1", 0.0, 0.0, "mim-catalysis"),
        ], zorder=12290),
        # inhibition TBar
        _interaction("ie004", [
            _point(700.0, 290.0, "ia007", 0.0, -1.0),
            _point(700.0, 110.0, "ia006", 0.0, 1.0, "TBar"),
        ], zorder=12291),
        # unconnected edge (no GraphRefs)
        _interaction("ie005", [
            _point(800.0, 100.0),
            _point(860.0, 160.0, arrow_head="Arrow"),
        ], zorder=12292),
        # GraphicalLine, no markers
        _interaction("ie006", [
            _point(820.0, 200.0),
            _point(880.0, 260.0),
        ], zorder=12293, element="GraphicalLine"),
    ]
    return _doc(
        _pathway_open(name="interactions (fixture)", board_w=950.0,
                      board_h=420.0),
        *parts,
    )


def gpml_groups():
    parts = [
        _datanode("ga001", "CDK4", "GeneProduct", cx=320.0, cy=110.0,
                  xref=("Entrez Gene", "1019"), group_ref="grp1"),
        _datanode("ga002", "CCND1", "GeneProduct", cx=320.0, cy=140.0,
                  zorder=32769, xref=("Entrez Gene", "595"),
                  group_ref="grp1"),
        _datanode("ga003", "RB1", "GeneProduct", cx=600.0, cy=120.0,
                  zorder=32770, xref=("Entrez Gene", "5925")),
        _datanode("ga004", "E2F1", "GeneProduct", cx=320.0, cy=260.0,
                  zorder=32771, xref=("Entrez Gene", "1869"),
                  group_ref="grp2"),
        _datanode("ga005", "TFDP1", "GeneProduct", cx=320.0, cy=290.0,
                  zorder=32772, xref=("Entrez Gene", "7027"),
                  group_ref="grp2"),
        # edge from group grp1 (via its GraphId) to a free node
        _interaction("ge001", [
            _point(360.0, 125.0, "gg001", 1.0, 0.0),
            _point(560.0, 120.0, "ga003", -1.0, 0.0, "TBar"),
        ]),
        _group("grp1", "gg001", style="Group"),
        _group("grp2", "gg002", style="Complex"),
        _group("grp3", "gg003"),  # empty group: must be filtered out
    ]
    return _doc(
        _pathway_open(name="groups (fixture)", board_w=700.0, board_h=400.0),
        *parts,
    )


def gpml_states():
    return _doc(
        _pathway_open(name="states (fixture)", board_w=300.0, board_h=300.0),
        _datanode("sa001", "AKT1", "Protein", cx=150.0, cy=150.0,
                  xref=("Entrez Gene", "207")),
        _state("ss001", "sa001", label="P", rel_x=1.0, rel_y=-1.0),
        _state("ss002", "sa001", label="Me", rel_x=-1.0, rel_y=1.0,
               shape_type="Rectangle"),
    )


def gpml_hyperedge():
    """Edge attached to an anchor on another edge, which is itself
    attached to an anchor on a third edge (depth 3)."""
    return _doc(
        _pathway_open(name="hyperedge (fixture)", board_w=600.0,
                      board_h=400.0),
        _datanode("ha001", "A", "Metabolite", cx=100.0, cy=100.0),
        _datanode("ha002", "B", "Metabolite", cx=500.0, cy=100.0,
                  zorder=32769),
        _datanode("ha003", "C", "Protein", cx=300.0, cy=300.0,
                  zorder=32770),
        _datanode("ha004", "D", "Protein", cx=500.0, cy=300.0,
                  zorder=32771),
        _interaction("he001", [
            _point(140.0, 100.0, "ha001", 1.0, 0.0),
            _point(460.0, 100.0, "ha002", -1.0, 0.0, "Arrow"),
        ], anchors=(("hanch1", 0.5, "None"),)),
        _interaction("he002", [
            _point(300.0, 290.0, "ha003", 0.0, -1.0),
            _point(300.0, 100.0, "hanch1", 0.0, 0.0, "mim-catalysis"),
        ], anchors=(("hanch2", 0.5, "Circle"),), zorder=12289),
        _interaction("he003", [
            _point(460.0, 300.0, "ha004", -1.0, 0.0),
            _point(300.0, 195.0, "hanch2", 0.0, 0.0, "mim-inhibition"),
        ], zorder=12290),
    )


def gpml_publication_xrefs():
    return _doc(
        _pathway_open(name="test case", version="20140130",
                      board_w=160.0, board_h=205.0),
        _datanode("pd001", "GeneProduct", "GeneProduct",
                  biopax_refs=("c70", "a54")),
        _biopax(publication_xrefs=[
            {"id": "c70", "ID": "15961557", "DB": "PubMed",
             "TITLE": "A later paper", "SOURCE": "J Biol Chem",
             "YEAR": "2005", "AUTHORS": ["Smith J", "Doe J"]},
            {"id": "a54", "ID": "10191091", "DB": "PubMed",
             "TITLE": "An earlier paper", "SOURCE": "Nature",
             "YEAR": "1999", "AUTHORS": ["Curie M"]},
        ]),
    )


def gpml_vocab():
    return _doc(
        _pathway_open(name="vocab (fixture)",
                      comments=[("WikiPathways-description",
                                 "A signaling pathway fixture.")]),
        _datanode("vd001", "KRAS", "GeneProduct",
                  xref=("Entrez Gene", "3845")),
        _biopax(vocabularies=[
            {"term": "signaling pathway", "id": "PW:0000003",
             "ontology": "Pathway Ontology"},
            {"term": "cancer", "id": "DOID:162", "ontology": "Disease"},
        ]),
    )


def gpml_shapes_labels():
    return _doc(
        _pathway_open(name="shapes and labels (fixture)", board_w=500.0,
                      board_h=400.0),
        _shape("sh001", 250.0, 200.0, 400.0, 300.0, rotation="0.0",
               cellular_component="Nucleus"),
        _shape("sh002", 120.0, 120.0, 60.0, 40.0, rotation="1.5707963267948966"),
        _label("lb001", "a label", 250.0, 60.0,
               href="http://example.org/more info"),
    )


def gpml_empty():
    return _doc(
        _pathway_open(name="test case",
                      license_="Freely available under Creative Commons license"),
    )


def gpml_giant(n_nodes=120):
    """Giant pathway for skew / big-page handling."""
    parts = []
    for i in range(n_nodes):
        parts.append(_datanode(
            f"bg{i:03x}", f"G{i}", "GeneProduct",
            cx=100.0 + (i % 12) * 100.0, cy=100.0 + (i // 12) * 60.0,
            zorder=32768 + i, xref=("Entrez Gene", str(900000 + i)),
        ))
    for i in range(n_nodes - 1):
        parts.append(_interaction(f"be{i:03x}", [
            _point(0.0, 0.0, f"bg{i:03x}", 1.0, 0.0),
            _point(0.0, 0.0, f"bg{i + 1:03x}", -1.0, 0.0, "Arrow"),
        ], zorder=12288 + i))
    return _doc(
        _pathway_open(name="giant (fixture)", board_w=1400.0,
                      board_h=800.0),
        *parts,
    )


def gpml_elbow():
    """ElbowLine with implicit waypoints (F4): left side of A to top
    of B, like the reference edge-elbow-left1-to-top1 fixtures."""
    return _doc(
        _pathway_open(name="elbow (fixture)", board_w=400.0,
                      board_h=300.0),
        _datanode("el001", "A", "Protein", cx=120.0, cy=130.0),
        _datanode("el002", "B", "Protein", cx=260.0, cy=90.0,
                  zorder=32769),
        _interaction("ee001", [
            _point(80.0, 130.0, "el001", -1.0, 0.0),
            _point(260.0, 80.0, "el002", 0.0, -1.0, "Arrow"),
        ], connector_type="Elbow"),
    )


def gpml_styled():
    """Exercises ValueConverters: named + hex colors, Broken line
    style, font weight/style/decoration, RoundedRectangle rx/ry,
    DoubleLineProperty, HTML entities in labels (P7-P11, P15)."""
    return _doc(
        _pathway_open(name="styled (fixture)", board_w=600.0,
                      board_h=300.0),
        # named color, broken line, bold italic underline
        '  <DataNode TextLabel="A &amp; B" GraphId="sty01" Type="Protein">\n'
        '    <Graphics CenterX="100.0" CenterY="100.0" Width="80.0" '
        'Height="20.0" ZOrder="32768" Color="Red" FillColor="ff00ff" '
        'LineStyle="Broken" FontWeight="Bold" FontStyle="Italic" '
        'FontDecoration="Underline" ShapeType="RoundedRectangle" />\n'
        '    <Xref Database="" ID="" />\n'
        "  </DataNode>",
        # double-line shape
        '  <Shape GraphId="sty02">\n'
        '    <Attribute Key="org.pathvisio.DoubleLineProperty" '
        'Value="Double" />\n'
        '    <Graphics CenterX="300.0" CenterY="100.0" Width="100.0" '
        'Height="60.0" ZOrder="16384" LineThickness="2.0" '
        'ShapeType="Oval" Color="008000" />\n'
        "  </Shape>",
        # strikethru label
        '  <Label TextLabel="struck" GraphId="sty03">\n'
        '    <Graphics CenterX="500.0" CenterY="100.0" Width="60.0" '
        'Height="20.0" ZOrder="28672" FontStrikethru="Strikethru" />\n'
        "  </Label>",
    )


def gpml_generated_ids():
    """Exercises the pvjsgeneratedid<hex> assignment: a group with no
    GraphId plus an existing hex-parsable id that must bump the counter
    (ref: src/GraphIdManager.ts:31-53)."""
    return _doc(
        _pathway_open(name="generated ids (fixture)", board_w=400.0,
                      board_h=300.0),
        _datanode("fefb4", "X", "GeneProduct", cx=100.0, cy=100.0,
                  group_ref="qg1"),
        _datanode("aa001", "Y", "GeneProduct", cx=100.0, cy=140.0,
                  zorder=32769, group_ref="qg1"),
        _group("qg1"),  # no GraphId -> generated
    )


FIXTURES = {
    "one-node": gpml_one_node,
    "data-nodes": gpml_data_nodes,
    "interactions": gpml_interactions,
    "groups": gpml_groups,
    "states": gpml_states,
    "hyperedge": gpml_hyperedge,
    "publication-xrefs": gpml_publication_xrefs,
    "vocab": gpml_vocab,
    "shapes-labels": gpml_shapes_labels,
    "empty": gpml_empty,
    "generated-ids": gpml_generated_ids,
    "styled": gpml_styled,
    "elbow": gpml_elbow,
}

# Page mix: each entry is (kind, fixture names embedded in the page).
PAGE_MIX = [
    ("one-node", ["one-node"]),
    ("data-nodes", ["data-nodes"]),
    ("interactions", ["interactions"]),
    ("groups", ["groups"]),
    ("states", ["states"]),
    ("hyperedge", ["hyperedge"]),
    ("publication-xrefs", ["publication-xrefs"]),
    ("vocab", ["vocab"]),
    ("shapes-labels", ["shapes-labels"]),
    ("empty", ["empty"]),
    ("generated-ids", ["generated-ids"]),
    ("styled", ["styled"]),
    ("elbow", ["elbow"]),
    ("multi", ["one-node", "states"]),       # multi-fragment page
    ("negative", []),                          # page with no GPML at all
]

_WORDS = (
    "pathway protein gene signal kinase receptor binding cell nucleus "
    "membrane transcription enzyme metabolite reaction complex activation "
    "inhibition phosphorylation expression regulation molecular cascade"
).split()


def _paragraphs(idx: int, kind: str) -> list[str]:
    h = int.from_bytes(hashlib.sha256(f"para:{idx}".encode()).digest()[:8],
                       "big")
    words = [_WORDS[(h >> (i * 5)) % len(_WORDS)] for i in range(9)]
    return [
        f"Fixture page {idx} of kind {kind}.",
        " ".join(words[:5]) + ".",
        " ".join(words[5:]) + ".",
    ]


def build_page(idx: int, seed: int = 42, hot_fraction: float = 0.125,
               giant_every: int = 200) -> dict:
    """Pure function: row index -> page record (deterministic)."""
    if giant_every and idx % giant_every == giant_every - 1:
        kind, fixture_names = "giant", ["giant"]
        fragments = [gpml_giant()]
    else:
        kind, fixture_names = PAGE_MIX[idx % len(PAGE_MIX)]
        fragments = [FIXTURES[f]() for f in fixture_names]

    # hot-domain skew: a slice of the corpus shares one domain
    h = int.from_bytes(hashlib.sha256(f"{seed}:{idx}".encode()).digest()[:4],
                       "big")
    if (h % 1000) < int(hot_fraction * 1000):
        domain = "hot.example"
    else:
        domain = f"site{h % 97}.example"
    url = f"https://{domain}/{kind}/{idx}"

    paras = _paragraphs(idx, kind)
    body = [f"<p>{p}</p>" for p in paras]
    for frag in fragments:
        body.append(
            '<script type="application/gpml+xml">\n' + frag + "\n</script>"
        )
    html = (
        f"<html><head><title>{kind} {idx}</title></head><body>\n"
        + "\n".join(body)
        + "\n</body></html>"
    )
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=idx),
        "html": html.encode("utf-8"),
        "text": "\n".join(paras),
        "lang": "en",
    }


def replicate_pages(pages: DataFrame, factor: int) -> DataFrame:
    """Deterministically scale a corpus by `factor` with distinct urls
    (same embedded GPML, unique lineage keys)."""
    if factor <= 1:
        return pages
    import pyspark.sql.functions as F
    copies = pages.sparkSession.range(factor).select(
        F.col("id").alias("copy"))
    return pages.crossJoin(copies).withColumn(
        "url", F.concat("url", F.lit("?copy="), F.col("copy"))
    ).drop("copy")


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         limit: int | None = None,
                         partitions: int | None = None) -> DataFrame:
    """Build the pages corpus from the driver-supplied documents table
    (one page per document row; the GPML fixture embedded is chosen
    deterministically by doc_id, and the document text becomes the
    page's paragraph text). This makes every KG query a genuine scan
    of the sf-dir parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    if limit:
        docs = docs.limit(limit)
    # a small parquet file arrives as ONE split; spread the Python
    # parse stage across the cluster
    docs = docs.repartition(
        partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"],
                                          pdf["lang"]):
                i = int(doc_id)
                kind, fixture_names = PAGE_MIX[i % len(PAGE_MIX)]
                paras = [str(text)]
                body = [f"<p>{p}</p>" for p in paras]
                for fx in fixture_names:
                    body.append(
                        '<script type="application/gpml+xml">\n'
                        + FIXTURES[fx]() + "\n</script>")
                html = (
                    f"<html><head><title>{kind} {i}</title></head><body>\n"
                    + "\n".join(body) + "\n</body></html>")
                rows.append({
                    "url": f"https://docs.example/{kind}/{i}",
                    "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                    "html": html.encode("utf-8"),
                    "text": "\n".join(paras),
                    "lang": str(lang),
                })
            yield pd.DataFrame(rows,
                               columns=[f.name for f in PAGES_SCHEMA])

    return docs.mapInPandas(gen, PAGES_SCHEMA)


def pages_df(spark: SparkSession, n_pages: int, seed: int = 42,
             hot_fraction: float = 0.125, giant_every: int = 200,
             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: spark.range -> mapInPandas."""

    def gen(batches):
        for pdf in batches:
            rows = [build_page(int(i), seed, hot_fraction, giant_every)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_pages, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)
