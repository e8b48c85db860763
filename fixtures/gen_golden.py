"""Generate frozen golden outputs from the reference compiler.

Run:  python fixtures/gen_golden.py

Produces:
  tests/golden/<doc>.json          — whole-document compiles of the reference's
                                     own corpus (test_bel, thorough, slushy,
                                     isolated, misordered)
  fixtures/pool.json               — self-contained statement units (header +
                                     citation/evidence + statement) with their
                                     per-unit golden nodes/edges/triples/warnings;
                                     the deterministic corpus generator composes
                                     documents from these units.
"""
import json
import logging
import os

logging.disable(logging.CRITICAL)

from reference_oracle import compile_bel_lines, compile_bel_path, graph_to_golden  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BEL_DIR = '/root/reference/src/pybel/testing/resources/bel'
GOLDEN_DIR = os.path.join(REPO, 'tests', 'golden')

# Header used by every synthetic corpus document. DEFINE URLs resolve to the
# reference's local fixture files by basename (see reference_oracle.url_to_path).
CORPUS_HEADER = [
    'SET DOCUMENT Name = "Synthetic Corpus Document"',
    'SET DOCUMENT Version = "1.0.0"',
    'SET DOCUMENT Description = "Deterministic synthetic corpus"',
    'SET DOCUMENT Authors = "Corpus Generator"',
    'SET DOCUMENT ContactInfo = "corpus@test"',
    'DEFINE NAMESPACE CHEBI AS URL "file://chebi-names.belns"',
    'DEFINE NAMESPACE HGNC AS URL "file://hgnc-names.belns"',
    'DEFINE NAMESPACE GO AS URL "file://go-names.belns"',
    'DEFINE NAMESPACE MESHD AS URL "file://mesh-names.belns"',
    'DEFINE NAMESPACE TESTNS2 AS URL "file://test_ns_2.belns"',
    'DEFINE NAMESPACE dbSNP AS PATTERN "rs[0-9]*"',
    'DEFINE ANNOTATION TESTAN1 AS LIST {"1","2","3"}',
    'DEFINE ANNOTATION TESTAN2 AS LIST {"1","2","3"}',
    'DEFINE ANNOTATION TestRegex AS PATTERN "[0-9]+"',
    'DEFINE ANNOTATION Species AS URL "file://species-taxonomy-id.belanno"',
    'DEFINE ANNOTATION CellLine AS URL "file://cell-line.belanno"',
]

# 'file://name' → real path handled in reference_oracle via basename lookup.

CONTROL_PREFIX = [
    'SET Citation = {{"PubMed","Synthetic article {idx}","{pmid}"}}',
    'SET Evidence = "Synthetic evidence {idx}"',
]


def extract_statement_lines(path):
    """Pull bare statement lines (non-control) from a reference BEL document."""
    import bel_resources
    with open(path, encoding='utf-8') as f:
        _, _, statements = bel_resources.split_file_to_annotations_and_definitions(list(f))
    out = []
    for _, line in statements:
        if line.startswith('SET ') or line.startswith('UNSET'):
            continue
        out.append(line)
    return out


def build_units():
    """Build the unit pool: each unit is a list of lines (control + statement)."""
    units = []

    def add(kind, statement, annotations=()):
        idx = len(units)
        lines = [
            'SET Citation = {{"PubMed","Synthetic article {}","{}"}}'.format(idx, 10000 + idx),
            'SET Evidence = "Synthetic evidence {}"'.format(idx),
        ]
        for key, value in annotations:
            lines.append('SET {} = "{}"'.format(key, value))
        lines.append(statement)
        units.append({'id': idx, 'kind': kind, 'lines': lines})

    # simple pool — test_bel-style relations between simple proteins
    simple = [
        'p(HGNC:AKT1) -> p(HGNC:EGFR)',
        'p(HGNC:EGFR) -| p(HGNC:FADD)',
        'p(HGNC:EGFR) =| p(HGNC:CASP8)',
        'p(HGNC:FADD) -> p(HGNC:CASP8)',
        'p(HGNC:AKT1) -- p(HGNC:CASP8)',
        'p(HGNC:AKT1) => p(HGNC:FADD)',
        'p(HGNC:CASP8) cnc p(HGNC:EGFR)',
        'p(HGNC:AKT1) reg bp(GO:"apoptotic process")',
        'act(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
        'p(HGNC:AKT1) -> act(p(HGNC:EGFR), ma(kin))',
    ]
    for s in simple:
        add('simple', s, annotations=[('Species', '9606')])

    # thorough pool — every statement line of thorough.bel as its own unit
    for s in extract_statement_lines(os.path.join(BEL_DIR, 'thorough.bel')):
        add('thorough', s)

    # annotated pool — rich annotation contexts (list values, multiple keys,
    # regex annotations) to exercise annotation-map summaries and filters
    annotated = [
        ('p(HGNC:AKT1) -> p(HGNC:FADD)',
         [('Species', '9606'), ('CellLine', '10B9 cell')]),
        ('p(HGNC:EGFR) -| p(HGNC:CASP8)',
         [('Species', '10090'), ('TestRegex', '123')]),
        ('p(HGNC:FADD) -- p(HGNC:EGFR)',
         [('Species', '9606'), ('TESTAN1', '1')]),
        ('act(p(HGNC:CASP8)) -> p(HGNC:AKT1)',
         [('CellLine', '1321N1 cell'), ('TESTAN2', '2')]),
        ('p(HGNC:AKT1) => bp(GO:"apoptotic process")',
         [('Species', '10116')]),
        ('g(HGNC:APP) :> r(HGNC:APP)',
         [('TESTAN1', '3'), ('TestRegex', '42')]),
    ]
    for s, anns in annotated:
        add('annotated', s, annotations=anns)

    # list-valued annotation SETs (SET KEY = {"a", "b"})
    units.append({
        'id': len(units), 'kind': 'annotated',
        'lines': [
            'SET Citation = {{"PubMed","Synthetic article {}","{}"}}'.format(
                len(units), 10000 + len(units)),
            'SET Evidence = "Synthetic evidence {}"'.format(len(units)),
            'SET TESTAN1 = {"1", "2"}',
            'SET Species = "9606"',
            'p(HGNC:CASP8) -| p(HGNC:FADD)',
        ],
    })
    units.append({
        'id': len(units), 'kind': 'annotated',
        'lines': [
            'SET Citation = {{"PubMed","Synthetic article {}","{}"}}'.format(
                len(units), 10000 + len(units)),
            'SET Evidence = "Synthetic evidence {}"'.format(len(units)),
            'SET TESTAN2 = {"2", "3"}',
            'SET CellLine = "10B9 cell"',
            'p(HGNC:MAPT) cnc p(HGNC:APP)',
            'UNSET CellLine',
            'p(HGNC:MAPT) -- p(HGNC:CFTR)',
        ],
    })

    # slushy pool — malformed statements that must produce warnings, no triples
    slushy = [
        'p(SFAM:"Bcl-2 Family") -> p(HGNC:MAPT)',             # undefined namespace
        'p(HGNC:AKT1) -> p(HGNC:missing)',                     # missing name
        'p(AKT1) -> p(HGNC:EGFR)',                             # naked name
        'p(HGNC:AKT1) -> bp(ZZZZ:nope)',                       # undefined namespace
        'p(HGNC:CASP8) ->',                                    # syntax error
        'p(HGNC:AKT1) - p(HGNC:EGFR)',                         # bad relation
    ]
    for s in slushy:
        add('slushy', s)

    return units


def compile_unit(unit):
    lines = CORPUS_HEADER + unit['lines']
    graph = compile_bel_lines(lines)
    golden = graph_to_golden(graph)
    # Drop the document-level metadata warnings? none expected: header is complete.
    return golden


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    # 1. whole-document golden compiles of the reference corpus
    doc_settings = {
        'test_bel': {},
        'thorough': {'allow_naked_names': True},
        'slushy': {},
        'isolated': {},
        'misordered': {'citation_clearing': False},
    }
    for name, kwargs in doc_settings.items():
        graph = compile_bel_path(os.path.join(BEL_DIR, '{}.bel'.format(name)), **kwargs)
        golden = graph_to_golden(graph)
        golden['settings'] = {k: v for k, v in kwargs.items()}
        with open(os.path.join(GOLDEN_DIR, '{}.json'.format(name)), 'w') as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        print(name, golden['n_nodes'], 'nodes', golden['n_edges'], 'edges',
              len(golden['triples']), 'triples', len(golden['warnings']), 'warnings')

    # 2. unit pool with per-unit golden
    units = build_units()
    for unit in units:
        unit['golden'] = compile_unit(unit)
    with open(os.path.join(HERE, 'pool.json'), 'w') as f:
        json.dump({'header': CORPUS_HEADER, 'units': units}, f, indent=1, sort_keys=True)
    n_trip = sum(len(u['golden']['triples']) for u in units)
    n_warn = sum(len(u['golden']['warnings']) for u in units)
    print('pool:', len(units), 'units,', n_trip, 'triples,', n_warn, 'warnings')


if __name__ == '__main__':
    main()
