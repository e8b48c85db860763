"""BEL language constants.

These mirror the published BEL 2.0+ specification and the reference compiler's
vocabulary (reference: src/pybel/constants.py, src/pybel/language.py) so that
emitted node/edge/triple values are identical. The code is new.
"""

BEL_DEFAULT_NAMESPACE = 'bel'
DIRTY = 'dirty'

# node functions
ABUNDANCE = 'Abundance'
GENE = 'Gene'
RNA = 'RNA'
MIRNA = 'miRNA'
PROTEIN = 'Protein'
BIOPROCESS = 'BiologicalProcess'
PATHOLOGY = 'Pathology'
POPULATION = 'Population'
COMPOSITE = 'Composite'
COMPLEX = 'Complex'
REACTION = 'Reaction'

#: function → canonical BEL function tag (reference constants.py:236-247)
REV_ABUNDANCE_LABELS = {
    ABUNDANCE: 'a',
    GENE: 'g',
    MIRNA: 'm',
    PROTEIN: 'p',
    RNA: 'r',
    BIOPROCESS: 'bp',
    PATHOLOGY: 'path',
    COMPLEX: 'complex',
    COMPOSITE: 'composite',
    POPULATION: 'pop',
}

#: BEL function keyword → internal function constant
FUNCTION_TAGS = {
    'a': ABUNDANCE, 'abundance': ABUNDANCE,
    'g': GENE, 'geneAbundance': GENE,
    'r': RNA, 'rnaAbundance': RNA,
    'm': MIRNA, 'microRNAAbundance': MIRNA,
    'p': PROTEIN, 'proteinAbundance': PROTEIN,
    'bp': BIOPROCESS, 'biologicalProcess': BIOPROCESS,
    'path': PATHOLOGY, 'pathology': PATHOLOGY, 'o': PATHOLOGY,
    'pop': POPULATION, 'populationAbundance': POPULATION,
    'complex': COMPLEX, 'complexAbundance': COMPLEX,
    'composite': COMPOSITE, 'compositeAbundance': COMPOSITE,
    'rxn': REACTION, 'reaction': REACTION,
}

# modifier kinds (term-level modifiers that become edge qualifiers)
ACTIVITY = 'Activity'
DEGRADATION = 'Degradation'
TRANSLOCATION = 'Translocation'
CELL_SECRETION = 'CellSecretion'
CELL_SURFACE_EXPRESSION = 'CellSurfaceExpression'

MODIFIER_TAGS = {
    'act': ACTIVITY, 'activity': ACTIVITY,
    'tloc': TRANSLOCATION, 'translocation': TRANSLOCATION,
    'sec': CELL_SECRETION, 'cellSecretion': CELL_SECRETION,
    'surf': CELL_SURFACE_EXPRESSION, 'cellSurfaceExpression': CELL_SURFACE_EXPRESSION,
    'deg': DEGRADATION, 'degradation': DEGRADATION,
}

INTRACELLULAR = 'intracellular'
EXTRACELLULAR = 'extracellular space'
CELL_SURFACE = 'cell surface'

# variant kinds
PMOD = 'pmod'
GMOD = 'gmod'
HGVS = 'hgvs'
FRAGMENT = 'frag'

# relations
INCREASES = 'increases'
DIRECTLY_INCREASES = 'directlyIncreases'
DECREASES = 'decreases'
DIRECTLY_DECREASES = 'directlyDecreases'
CAUSES_NO_CHANGE = 'causesNoChange'
REGULATES = 'regulates'
BINDS = 'binds'
CORRELATION = 'correlation'
NO_CORRELATION = 'noCorrelation'
NEGATIVE_CORRELATION = 'negativeCorrelation'
POSITIVE_CORRELATION = 'positiveCorrelation'
ASSOCIATION = 'association'
ORTHOLOGOUS = 'orthologous'
ANALOGOUS_TO = 'analogousTo'
IS_A = 'isA'
RATE_LIMITING_STEP_OF = 'rateLimitingStepOf'
SUBPROCESS_OF = 'subProcessOf'
BIOMARKER_FOR = 'biomarkerFor'
PROGNOSTIC_BIOMARKER_FOR = 'prognosticBiomarkerFor'
EQUIVALENT_TO = 'equivalentTo'
PART_OF = 'partOf'
TRANSCRIBED_TO = 'transcribedTo'
TRANSLATED_TO = 'translatedTo'
HAS_REACTANT = 'hasReactant'
HAS_PRODUCT = 'hasProduct'
HAS_VARIANT = 'hasVariant'

#: tokens usable between two full BEL terms → canonical relation
BEL_TO_BEL_RELATION_KEYWORDS = {
    '->': INCREASES, '→': INCREASES, 'increases': INCREASES,
    '=>': DIRECTLY_INCREASES, '⇒': DIRECTLY_INCREASES, 'directlyIncreases': DIRECTLY_INCREASES,
    '-|': DECREASES, 'decreases': DECREASES,
    '=|': DIRECTLY_DECREASES, 'directlyDecreases': DIRECTLY_DECREASES,
    'cnc': CAUSES_NO_CHANGE, 'causesNoChange': CAUSES_NO_CHANGE,
    'reg': REGULATES, 'regulates': REGULATES,
    'binds': BINDS,
    'cor': CORRELATION, 'correlation': CORRELATION,
    'noCor': NO_CORRELATION, 'noCorrelation': NO_CORRELATION,
    'neg': NEGATIVE_CORRELATION, 'negativeCorrelation': NEGATIVE_CORRELATION,
    'pos': POSITIVE_CORRELATION, 'positiveCorrelation': POSITIVE_CORRELATION,
    '--': ASSOCIATION, 'association': ASSOCIATION,
    'orthologous': ORTHOLOGOUS,
    'isA': IS_A,
    'eq': EQUIVALENT_TO, 'equivalentTo': EQUIVALENT_TO,
    'partOf': PART_OF,
    'analogousTo': ANALOGOUS_TO,
}

#: all statement-level relation keywords (mixed relations included)
MIXED_RELATION_KEYWORDS = {
    'rateLimitingStepOf': RATE_LIMITING_STEP_OF,
    'subProcessOf': SUBPROCESS_OF,
    ':>': TRANSCRIBED_TO, 'transcribedTo': TRANSCRIBED_TO,
    '>>': TRANSLATED_TO, 'translatedTo': TRANSLATED_TO,
    'biomarkerFor': BIOMARKER_FOR,
    'prognosticBiomarkerFor': PROGNOSTIC_BIOMARKER_FOR,
    'hasMember': 'hasMember',
    'hasMembers': 'hasMembers',
    'hasComponent': 'hasComponent',
    'hasComponents': 'hasComponents',
    'hasVariant': HAS_VARIANT,
    'hasReactant': HAS_REACTANT,
    'hasProduct': HAS_PRODUCT,
}

ALL_RELATION_KEYWORDS = dict(BEL_TO_BEL_RELATION_KEYWORDS)
ALL_RELATION_KEYWORDS.update(MIXED_RELATION_KEYWORDS)

#: relation symbols (non-word tokens), longest-first for the tokenizer
RELATION_SYMBOLS = sorted(
    (k for k in ALL_RELATION_KEYWORDS if not k[0].isalpha()),
    key=len,
    reverse=True,
)

CAUSAL_INCREASE_RELATIONS = {INCREASES, DIRECTLY_INCREASES}
CAUSAL_DECREASE_RELATIONS = {DECREASES, DIRECTLY_DECREASES}
CAUSAL_POLAR_RELATIONS = CAUSAL_INCREASE_RELATIONS | CAUSAL_DECREASE_RELATIONS
CAUSAL_RELATIONS = CAUSAL_POLAR_RELATIONS | {REGULATES}
DIRECT_CAUSAL_RELATIONS = {DIRECTLY_INCREASES, DIRECTLY_DECREASES}
APOLAR_CORRELATIVE_RELATIONS = {CORRELATION, NO_CORRELATION}
POLAR_CORRELATIVE_RELATIONS = {POSITIVE_CORRELATION, NEGATIVE_CORRELATION}
CORRELATIVE_RELATIONS = APOLAR_CORRELATIVE_RELATIONS | POLAR_CORRELATIVE_RELATIONS

#: relations materialized in both directions (reference constants.py:372-378)
TWO_WAY_RELATIONS = CORRELATIVE_RELATIONS | {
    ASSOCIATION, ORTHOLOGOUS, ANALOGOUS_TO, EQUIVALENT_TO, BINDS,
}

#: relations that don't require citation/evidence (reference constants.py:381-391)
UNQUALIFIED_EDGES = {
    HAS_REACTANT, HAS_PRODUCT, HAS_VARIANT, TRANSCRIBED_TO, TRANSLATED_TO,
    IS_A, EQUIVALENT_TO, PART_OF, ORTHOLOGOUS,
}

#: namespace-file encoding char → allowed node functions (reference constants.py:538-547)
BELNS_ENCODINGS = {
    'G': {GENE},
    'R': {RNA, MIRNA},
    'P': {PROTEIN},
    'M': {MIRNA},
    'A': {ABUNDANCE, RNA, MIRNA, PROTEIN, GENE, COMPLEX},
    'B': {PATHOLOGY, BIOPROCESS},
    'O': {PATHOLOGY},
    'C': {COMPLEX},
}

#: citation database names accepted in SET Citation (reference constants.py:39-48)
CITATION_TYPES = {
    'Book', 'PubMed', 'PubMed Central', 'Journal', 'Online Resource', 'URL',
    'DOI', 'Other',
}
CITATION_TYPE_PUBMED = 'PubMed'

#: BEL1 activity labels → BEL2 ma() default-namespace names (reference language.py:86-111)
ACTIVITY_LABELS = {
    'catalyticActivity': 'cat', 'cat': 'cat',
    'chaperoneActivity': 'chap', 'chap': 'chap',
    'gtpBoundActivity': 'gtp', 'gtp': 'gtp',
    'kinaseActivity': 'kin', 'kin': 'kin',
    'peptidaseActivity': 'pep', 'pep': 'pep',
    'phosphataseActivity': 'phos', 'phos': 'phos',
    'ribosylationActivity': 'ribo', 'ribo': 'ribo',
    'transcriptionalActivity': 'tscript', 'tscript': 'tscript',
    'transportActivity': 'tport', 'tport': 'tport',
    'molecularActivity': 'molecularActivity',
    'guanineNucleotideExchangeFactorActivity': 'gef', 'gef': 'gef',
    'gtpaseActivatingProteinActivity': 'gap', 'gap': 'gap',
}

#: default pmod() names and their synonyms (reference language.py pmod_namespace)
PMOD_NAMESPACE = {
    'Ac': 'Ac', 'acetylation': 'Ac',
    'ADPRib': 'ADPRib', 'ADP-ribosylation': 'ADPRib',
    'adenosine diphosphoribosyl': 'ADPRib',
    'Farn': 'Farn', 'farnesylation': 'Farn',
    'Gerger': 'Gerger', 'geranylgeranylation': 'Gerger',
    'Glyco': 'Glyco', 'glycosylation': 'Glyco',
    'Hy': 'Hy', 'hydroxylation': 'Hy',
    'ISG': 'ISG', 'ISGylation': 'ISG', 'ISG15-protein conjugation': 'ISG',
    'Me': 'Me', 'methylation': 'Me',
    'Me1': 'Me1', 'monomethylation': 'Me1', 'mono-methylation': 'Me1',
    'Me2': 'Me2', 'dimethylation': 'Me2', 'di-methylation': 'Me2',
    'Me3': 'Me3', 'trimethylation': 'Me3', 'tri-methylation': 'Me3',
    'Myr': 'Myr', 'myristoylation': 'Myr',
    'Nedd': 'Nedd', 'neddylation': 'Nedd',
    'NGlyco': 'NGlyco', 'N-linked glycosylation': 'NGlyco',
    'NO': 'NO', 'Nitrosylation': 'NO',
    'OGlyco': 'OGlyco', 'O-linked glycosylation': 'OGlyco',
    'Palm': 'Palm', 'palmitoylation': 'Palm',
    'Ph': 'Ph', 'phosphorylation': 'Ph',
    'Sulf': 'Sulf', 'sulfation': 'Sulf', 'sulphation': 'Sulf',
    'sulfur addition': 'Sulf', 'sulphur addition': 'Sulf',
    'sulfonation': 'sulfonation', 'sulphonation': 'sulfonation',
    'Sumo': 'Sumo', 'SUMOylation': 'Sumo',
    'Ub': 'Ub', 'ubiquitination': 'Ub', 'ubiquitinylation': 'Ub',
    'ubiquitylation': 'Ub',
    'UbK48': 'UbK48', 'Lysine 48-linked polyubiquitination': 'UbK48',
    'UbK63': 'UbK63', 'Lysine 63-linked polyubiquitination': 'UbK63',
    'UbMono': 'UbMono', 'monoubiquitination': 'UbMono',
    'UbPoly': 'UbPoly', 'polyubiquitination': 'UbPoly',
    'Ox': 'Ox', 'oxidation': 'Ox',
}

#: BEL1 single-letter pmod() labels (reference language.py pmod_legacy_labels)
PMOD_LEGACY_LABELS = {
    'P': 'Ph', 'A': 'Ac', 'F': 'Farn', 'G': 'Glyco', 'H': 'Hy',
    'M': 'Me', 'R': 'ADPRib', 'S': 'Sumo', 'U': 'Ub', 'O': 'Ox',
}

#: gmod() labels (reference language.py gmod_namespace)
GMOD_NAMESPACE = {
    'methylation': 'Me', 'Me': 'Me', 'M': 'Me', 'ADPRib': 'ADPRib',
}

#: single-letter → three-letter amino acid codes (reference language.py)
AMINO_ACIDS = {
    'A': 'Ala', 'R': 'Arg', 'N': 'Asn', 'D': 'Asp', 'C': 'Cys', 'E': 'Glu',
    'Q': 'Gln', 'G': 'Gly', 'H': 'His', 'I': 'Ile', 'L': 'Leu', 'K': 'Lys',
    'M': 'Met', 'F': 'Phe', 'P': 'Pro', 'S': 'Ser', 'T': 'Thr', 'W': 'Trp',
    'Y': 'Tyr', 'V': 'Val',
}
AMINO_ACID_TRIPLES = set(AMINO_ACIDS.values())

DNA_NUCLEOTIDES = {'A', 'T', 'C', 'G'}

#: BEL script control keywords
BEL_KEYWORD_SET = 'SET'
BEL_KEYWORD_UNSET = 'UNSET'
BEL_KEYWORD_CITATION = 'Citation'
BEL_KEYWORD_EVIDENCE = 'Evidence'
BEL_KEYWORD_SUPPORT = 'SupportingText'
BEL_KEYWORD_STATEMENT_GROUP = 'STATEMENT_GROUP'
BEL_KEYWORD_ALL = 'ALL'

#: required SET DOCUMENT fields (reference constants.py REQUIRED_METADATA)
DOCUMENT_KEYS = {
    'Authors': 'authors',
    'ContactInfo': 'contact',
    'Copyright': 'copyright',
    'Description': 'description',
    'Disclaimer': 'disclaimer',
    'Licenses': 'licenses',
    'Name': 'name',
    'Version': 'version',
    'Project': 'project',
}
REQUIRED_METADATA = ['name', 'version', 'description', 'authors', 'contact']
