"""Dialect tables for the GPML2013a -> pvjson-style knowledge-graph mapping.

These are small broadcast dictionaries (the "dialect layer" of the
pipeline).  Semantics re-derived from the reference converter
(wikipathways/gpml2pvjson-js) and re-expressed as data for Spark-side
broadcast joins / `F.create_map` literal lookups:

- KEY_MAPPINGS             <- /root/reference/src/2013a/KeyMappings.json
- VALUE_MAPPINGS           <- /root/reference/src/2013a/ValueMappings.json
- MARKER_MAPPINGS          <- /root/reference/src/edge/MarkerMappings.json
- GROUP_STYLE_MAPPINGS     <- /root/reference/src/2013a/GroupMappingsByStyle.json
- VOCABULARY_NAME_TO_IRI   <- /root/reference/src/spinoffs/VOCABULARY_NAME_TO_IRI.json
- GPML defaults            <- /root/reference/src/GPMLDefaults.ts:62-157
- kaavio types             <- /root/reference/src/Processor.ts:46-58
- BioPAX classification    <- /root/reference/src/pvjsonToBioPAX/{PvjsonToBioPAX,
                              ArrowHeadMappings}.json + Interaction.ts:94-276
- named colors             <- behavior of the `rgbcolor` JS lib used at
                              /root/reference/src/2013a/ValueConverters.ts:314-332
"""

from __future__ import annotations

# GPML element name -> kaavio discriminator
# (src/Processor.ts:46-58)
GPML_ELEMENT_NAME_TO_KAAVIO_TYPE = {
    "Anchor": "Burr",
    "BiopaxRef": "Citation",
    "DataNode": "SingleFreeNode",
    "GraphicalLine": "Edge",
    "Group": "Group",
    "Interaction": "Edge",
    "Label": "SingleFreeNode",
    "Shape": "SingleFreeNode",
    "State": "Burr",
}

# GPML value -> pvjson value (src/2013a/ValueMappings.json)
VALUE_MAPPINGS = {
    "GeneProdKegg enzymeuct": "Protein",
    "SimplePhysicalEntity": "Unknown",
    "Modifier": "Metabolite",
    "State": "Metabolite",
    "Arrow": "Arrow",
    "TBar": "TBar",
    "LigandRound": "none",
    "LigandSquare": "none",
    "Line": "none",
    "mim-binding": "MimBinding",
    "mim-branching-left": "MimBranchingLeft",
    "mim-branching-right": "MimBranchingRight",
    "mim-catalysis": "MimCatalysis",
    "mim-cleavage": "MimCleavage",
    "mim-conversion": "MimConversion",
    "mim-covalent-bond": "MimCovalentBond",
    "mim-gap": "MimGap",
    "mim-inhibition": "MimInhibition",
    "mim-modification": "MimModification",
    "mim-necessary-stimulation": "MimNecessaryStimulation",
    "mim-stimulation": "MimStimulation",
    "mim-transcription-translation": "MimTranscriptionTranslation",
    "Receptor": "none",
    "ReceptorSquare": "none",
    "Double": "double",
    "Arc": "ArcPathVisio",
    "Brace": "Brace",
    "Circle": "Ellipse",
    "Endoplasmic Reticulum": "EndoplasmicReticulum",
    "Golgi Apparatus": "GolgiApparatus",
    "Hexagon": "HexagonPathVisio",
    "mim-degradation": "MimDegradation",
    "Mitochondria": "Mitochondria",
    "Oval": "Ellipse",
    "Octagon": "Octagon",
    "Pentagon": "PentagonPathVisio",
    "Rectangle": "rect",
    "RoundedRectangle": "rect",
    "Triangle": "TrianglePathVisio",
    "Sarcoplasmic Reticulum": "SarcoplasmicReticulum",
    "None": "none",
}

# Edge marker (mapped ArrowHead name) -> ontology types.
# (src/edge/MarkerMappings.json; only sbo + wp entries contribute to
# `type` -- the `bp.name` record is filtered out by unionLSV, see
# src/spinoffs/jsonld-utils.ts:85-89 + observed golden outputs.)
MARKER_MAPPINGS = {
    "Arrow": {"bp": "Interaction", "control_type": None,
              "sbo": ["SBO:0000167", "SBO:0000393", "SBO:0000394"],
              "wp": "DirectedInteraction"},
    "TBar": {"bp": "Control", "control_type": "INHIBITION",
             "sbo": ["SBO:0000169"], "wp": "Inhibition"},
    "MIMGap": {"bp": "Interaction", "control_type": None, "sbo": [], "wp": None},
    "MIMBranchingRight": {"bp": "Interaction", "control_type": None, "sbo": [], "wp": None},
    "MIMBranchingLeft": {"bp": "Interaction", "control_type": None, "sbo": [], "wp": None},
    "MIMInhibition": {"bp": "Control", "control_type": "INHIBITION",
                      "sbo": ["SBO:0000169"], "wp": "Inhibition"},
    "MIMConversion": {"bp": "Conversion", "control_type": None,
                      "sbo": ["SBO:0000182"], "wp": "Conversion"},
    "MIMNecessaryStimulation": {"bp": "Control", "control_type": "ACTIVATION",
                                "sbo": ["SBO:0000171"], "wp": "Stimulation"},
    "MIMBinding": {"bp": "MolecularInteraction", "control_type": None,
                   "sbo": ["SBO:0000177"], "wp": "Binding"},
    "MIMStimulation": {"bp": "Control", "control_type": "ACTIVATION",
                       "sbo": ["SBO:0000170"], "wp": "Stimulation"},
    "MIMModification": {"bp": "BiochemicalReaction", "control_type": None,
                        "sbo": ["SBO:0000210"], "wp": "DirectedInteraction"},
    "MIMCatalysis": {"bp": "Catalysis", "control_type": None,
                     "sbo": ["SBO:0000172"], "wp": "Catalysis"},
    "MIMCleavage": {"bp": "Degradation", "control_type": None,
                    "sbo": ["SBO:0000178"], "wp": "DirectedInteraction"},
    "MIMCovalentBond": {"bp": "BiochemicalReaction", "control_type": None,
                        "sbo": ["SBO:0000210"], "wp": "DirectedInteraction"},
    "MIMTranscriptionTranslation": {"bp": "GeneticInteraction", "control_type": None,
                                    "sbo": ["SBO:0000183", "SBO:0000184"], "wp": None},
    "none": {"bp": "Interaction", "control_type": None,
             "sbo": ["SBO:0000374"], "wp": "TranscriptionTranslation"},
}

# GPML Group Style -> graphics overrides + types
# (src/2013a/GroupMappingsByStyle.json; applied with override precedence
#  per src/group.ts:153-181 `assign(oldValue, mappingValue)`)
GROUP_STYLE_MAPPINGS = {
    "None": {"padding": 8.0, "shape_type": "Rectangle", "line_style": "Broken",
             "line_thickness": 1.0, "fill_color": "B4B464",
             "types": ["Group", "GroupNone"]},
    "Group": {"padding": 8.0, "shape_type": "None", "line_style": "Broken",
              "line_thickness": 0.0, "fill_color": "Transparent",
              "types": ["Group", "GroupGroup"]},
    "Complex": {"padding": 11.0, "shape_type": "Octagon", "line_style": "Solid",
                "line_thickness": 1.0, "fill_color": "B4B464",
                "types": ["Group", "Complex", "GroupComplex"]},
    "Pathway": {"padding": 8.0, "shape_type": "Rectangle", "line_style": "Broken",
                "line_thickness": 0.5, "fill_color": "00FF00",
                "types": ["Group", "Pathway", "GroupPathway"]},
}

# openControlledVocabulary ontology name -> IRI prefix
# (src/spinoffs/VOCABULARY_NAME_TO_IRI.json)
VOCABULARY_NAME_TO_IRI = {
    "Cell Type": "http://identifiers.org/cl/",
    "Disease": "http://identifiers.org/doid/",
    "Pathway Ontology": "http://identifiers.org/pw/",
}

# Per-class GPML graphics defaults (src/GPMLDefaults.ts:62-157).
# Keys use our flattened snake_case mention-column names.
_FONT_DEFAULTS = {
    "align": "Center", "font_decoration": "Normal", "font_name": "Arial",
    "font_size": 12.0, "font_strikethru": "Normal", "font_style": "Normal",
    "font_weight": "Normal", "valign": "Top",
}
_SHAPE_STYLE_DEFAULTS = {
    "color": "Black", "line_style": "Solid", "line_thickness": 1.0,
    "padding_attr": 8.0,
}

GPML_DEFAULTS = {
    "DataNode": {**_FONT_DEFAULTS, **_SHAPE_STYLE_DEFAULTS,
                 "fill_color": "White", "shape_type": "Rectangle",
                 "wp_type": "Unknown"},
    "Label": {**_FONT_DEFAULTS, **_SHAPE_STYLE_DEFAULTS,
              "fill_color": "Transparent", "shape_type": "None"},
    "Shape": {**_FONT_DEFAULTS, **_SHAPE_STYLE_DEFAULTS,
              "fill_color": "Transparent", "font_size": 10.0,
              "rotation": "Top"},
    "State": {**_SHAPE_STYLE_DEFAULTS, "align": "Center", "padding_attr": 1.0,
              "fill_color": "White", "font_size": 10.0,
              "shape_type": "Rectangle", "valign": "Middle",
              "state_type": "Unknown"},
    "Group": {"align": "Center", "color": "808080", "valign": "Middle",
              "font_size": 1.0, "font_weight": "Bold", "line_thickness": 1.0,
              "fill_opacity": 0.1, "style": "None"},
    "Anchor": {"anchor_shape": "None", "line_thickness": 0.0},
    "Interaction": {"color": "Black", "line_style": "Solid",
                    "connector_type": "Straight", "fill_color": "None",
                    "line_thickness": 1.0},
    "GraphicalLine": {"color": "Black", "line_style": "Solid",
                      "connector_type": "Straight", "fill_color": "None",
                      "line_thickness": 1.0},
    "Pathway": {"board_height": 500.0, "name": "Untitled Pathway"},
}

# Extra pvjson presentation defaults that ride along with FontAttributes
# (lineHeight/overflow/textOverflow/whiteSpace, src/GPMLDefaults.ts:3-16).
FONT_EXTRA_DEFAULTS = {
    "lineHeight": 1.1, "overflow": "hidden",
    "textOverflow": "clip", "whiteSpace": "pre",
}
FONT_EXTRA_CLASSES = {"DataNode", "Label", "Shape"}

# pvjson type -> BioPAX term (src/pvjsonToBioPAX/PvjsonToBioPAX.json)
PVJSON_TO_BIOPAX = {
    "Complex": "Complex",
    "GeneProduct": "Dna",
    "Metabolite": "SmallMolecule",
    "Pathway": "Pathway",
    "Protein": "Protein",
    "Rna": "Rna",
    "Unknown": "PhysicalEntity",
}

# (src/pvjsonToBioPAX/Interaction.ts:29-48)
BIOPAX_PHYSICAL_ENTITY_TYPES = [
    "Protein", "Dna", "Rna", "SmallMolecule", "Gene", "PhysicalEntity",
    "Complex",
]
BIOPAX_NODE_TYPES = BIOPAX_PHYSICAL_ENTITY_TYPES + [
    "PublicationXref", "UnificationXref", "RelationshipXref",
    "ProteinReference", "DnaReference", "RnaReference",
    "SmallMoleculeReference", "Pathway",
]

# Subset of CSS/HTML named colors accepted by the `rgbcolor` lib that
# plausibly occur in GPML (PathVisio emits hex or these names).
NAMED_COLORS = {
    "aqua": "#00ffff", "black": "#000000", "blue": "#0000ff",
    "cyan": "#00ffff", "darkgray": "#a9a9a9", "fuchsia": "#ff00ff",
    "gray": "#808080", "green": "#008000", "grey": "#808080",
    "lightgray": "#d3d3d3", "lime": "#00ff00", "magenta": "#ff00ff",
    "maroon": "#800000", "navy": "#000080", "olive": "#808000",
    "orange": "#ffa500", "purple": "#800080", "red": "#ff0000",
    "silver": "#c0c0c0", "teal": "#008080", "white": "#ffffff",
    "yellow": "#ffff00",
}

# Supported GPML namespaces (src/gpml-utilities.ts:114-119)
SUPPORTED_NAMESPACES = [
    "http://pathvisio.org/GPML/2013a",
    "http://genmapp.org/GPML/2010a",
    "http://genmapp.org/GPML/2008a",
    "http://genmapp.org/GPML/2007",
]

# JSON-LD @context URL (src/2013a/toPvjson.ts:281-283)
JSONLD_CONTEXT = (
    "https://cdn.rawgit.com/wikipathways/WpVocabularies/7a46a05/contexts/"
    "pvjs.jsonld"
)

# Triple predicates emitted by the materialization stage (our KG vocab).
PRED_TYPE = "rdf:type"
PRED_LABEL = "rdfs:label"
PRED_XREF = "wp:xref"
PRED_CONTAINS = "wp:contains"
PRED_IS_PART_OF = "wp:isPartOf"
PRED_SOURCE = "wp:source"
PRED_TARGET = "wp:target"
PRED_CONTROLLER = "bp:controller"
PRED_CONTROLLED = "bp:controlled"
PRED_LEFT = "bp:left"
PRED_RIGHT = "bp:right"
PRED_PARTICIPANT = "bp:participant"
PRED_CONTROL_TYPE = "bp:controlType"
PRED_CONVERSION_DIRECTION = "bp:conversionDirection"
PRED_ONTOLOGY_TAG = "wp:ontologyTag"
PRED_CITATION = "wp:citation"
PRED_SAME_AS = "owl:sameAs"
PRED_CANONICAL = "wp:canonical"
