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

# Full CSS3/X11 named-color table as accepted by the `rgbcolor` lib
# (behavior at /root/reference/src/2013a/ValueConverters.ts:314-332).
NAMED_COLORS = {
    "aliceblue": "#f0f8ff", "antiquewhite": "#faebd7", "aqua": "#00ffff",
    "aquamarine": "#7fffd4", "azure": "#f0ffff", "beige": "#f5f5dc",
    "bisque": "#ffe4c4", "black": "#000000", "blanchedalmond": "#ffebcd",
    "blue": "#0000ff", "blueviolet": "#8a2be2", "brown": "#a52a2a",
    "burlywood": "#deb887", "cadetblue": "#5f9ea0", "chartreuse": "#7fff00",
    "chocolate": "#d2691e", "coral": "#ff7f50",
    "cornflowerblue": "#6495ed", "cornsilk": "#fff8dc",
    "crimson": "#dc143c", "cyan": "#00ffff", "darkblue": "#00008b",
    "darkcyan": "#008b8b", "darkgoldenrod": "#b8860b",
    "darkgray": "#a9a9a9", "darkgreen": "#006400", "darkgrey": "#a9a9a9",
    "darkkhaki": "#bdb76b", "darkmagenta": "#8b008b",
    "darkolivegreen": "#556b2f", "darkorange": "#ff8c00",
    "darkorchid": "#9932cc", "darkred": "#8b0000", "darksalmon": "#e9967a",
    "darkseagreen": "#8fbc8f", "darkslateblue": "#483d8b",
    "darkslategray": "#2f4f4f", "darkslategrey": "#2f4f4f",
    "darkturquoise": "#00ced1", "darkviolet": "#9400d3",
    "deeppink": "#ff1493", "deepskyblue": "#00bfff", "dimgray": "#696969",
    "dimgrey": "#696969", "dodgerblue": "#1e90ff", "firebrick": "#b22222",
    "floralwhite": "#fffaf0", "forestgreen": "#228b22",
    "fuchsia": "#ff00ff", "gainsboro": "#dcdcdc", "ghostwhite": "#f8f8ff",
    "gold": "#ffd700", "goldenrod": "#daa520", "gray": "#808080",
    "green": "#008000", "greenyellow": "#adff2f", "grey": "#808080",
    "honeydew": "#f0fff0", "hotpink": "#ff69b4", "indianred": "#cd5c5c",
    "indigo": "#4b0082", "ivory": "#fffff0", "khaki": "#f0e68c",
    "lavender": "#e6e6fa", "lavenderblush": "#fff0f5",
    "lawngreen": "#7cfc00", "lemonchiffon": "#fffacd",
    "lightblue": "#add8e6", "lightcoral": "#f08080",
    "lightcyan": "#e0ffff", "lightgoldenrodyellow": "#fafad2",
    "lightgray": "#d3d3d3", "lightgreen": "#90ee90",
    "lightgrey": "#d3d3d3", "lightpink": "#ffb6c1",
    "lightsalmon": "#ffa07a", "lightseagreen": "#20b2aa",
    "lightskyblue": "#87cefa", "lightslategray": "#778899",
    "lightslategrey": "#778899", "lightsteelblue": "#b0c4de",
    "lightyellow": "#ffffe0", "lime": "#00ff00", "limegreen": "#32cd32",
    "linen": "#faf0e6", "magenta": "#ff00ff", "maroon": "#800000",
    "mediumaquamarine": "#66cdaa", "mediumblue": "#0000cd",
    "mediumorchid": "#ba55d3", "mediumpurple": "#9370db",
    "mediumseagreen": "#3cb371", "mediumslateblue": "#7b68ee",
    "mediumspringgreen": "#00fa9a", "mediumturquoise": "#48d1cc",
    "mediumvioletred": "#c71585", "midnightblue": "#191970",
    "mintcream": "#f5fffa", "mistyrose": "#ffe4e1", "moccasin": "#ffe4b5",
    "navajowhite": "#ffdead", "navy": "#000080", "oldlace": "#fdf5e6",
    "olive": "#808000", "olivedrab": "#6b8e23", "orange": "#ffa500",
    "orangered": "#ff4500", "orchid": "#da70d6",
    "palegoldenrod": "#eee8aa", "palegreen": "#98fb98",
    "paleturquoise": "#afeeee", "palevioletred": "#db7093",
    "papayawhip": "#ffefd5", "peachpuff": "#ffdab9", "peru": "#cd853f",
    "pink": "#ffc0cb", "plum": "#dda0dd", "powderblue": "#b0e0e6",
    "purple": "#800080", "red": "#ff0000", "rosybrown": "#bc8f8f",
    "royalblue": "#4169e1", "saddlebrown": "#8b4513", "salmon": "#fa8072",
    "sandybrown": "#f4a460", "seagreen": "#2e8b57", "seashell": "#fff5ee",
    "sienna": "#a0522d", "silver": "#c0c0c0", "skyblue": "#87ceeb",
    "slateblue": "#6a5acd", "slategray": "#708090",
    "slategrey": "#708090", "snow": "#fffafa", "springgreen": "#00ff7f",
    "steelblue": "#4682b4", "tan": "#d2b48c", "teal": "#008080",
    "thistle": "#d8bfd8", "tomato": "#ff6347", "turquoise": "#40e0d0",
    "violet": "#ee82ee", "wheat": "#f5deb3", "white": "#ffffff",
    "whitesmoke": "#f5f5f5", "yellow": "#ffff00",
    "yellowgreen": "#9acd32",
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
PRED_TERM = "wp:term"
