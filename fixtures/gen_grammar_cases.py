"""Generate a statement-level grammar case table from the reference compiler.

Each case: one BEL statement (with standard citation/evidence context) →
the reference's parsed node BEL strings, relation, and triple output.
Covers alternate spellings (long-form function/relation keywords, unicode
arrows, BEL1 legacy forms) that the corpus documents don't exercise.

Run: python fixtures/gen_grammar_cases.py   → fixtures/grammar_cases.json
"""
import json
import logging
import os

logging.disable(logging.CRITICAL)

from gen_golden import CORPUS_HEADER  # noqa: E402
from reference_oracle import compile_bel_lines, graph_to_golden  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

#: statements exercising alternate spellings and legacy forms
CASES = [
    # long-form function names
    'proteinAbundance(HGNC:AKT1) increases proteinAbundance(HGNC:EGFR)',
    'geneAbundance(HGNC:AKT1) increases rnaAbundance(HGNC:EGFR)',
    'abundance(CHEBI:"oxygen atom") increases biologicalProcess(GO:"apoptotic process")',
    'microRNAAbundance(HGNC:MIR21) decreases rnaAbundance(HGNC:EGFR)',
    'pathology(MESHD:Psoriasis) association pathology(MESHD:"Skin Diseases")',
    'complexAbundance(proteinAbundance(HGNC:FADD), proteinAbundance(HGNC:CASP8)) '
    'increases proteinAbundance(HGNC:AKT1)',
    'compositeAbundance(proteinAbundance(HGNC:FADD), abundance(CHEBI:"oxygen atom")) '
    'increases proteinAbundance(HGNC:AKT1)',
    'populationAbundance(TESTNS2:"Hs") association pathology(MESHD:Psoriasis)',
    # unicode arrows
    'p(HGNC:AKT1) → p(HGNC:EGFR)',
    'p(HGNC:AKT1) ⇒ p(HGNC:EGFR)',
    # relation long forms
    'p(HGNC:AKT1) directlyIncreases p(HGNC:EGFR)',
    'p(HGNC:AKT1) directlyDecreases p(HGNC:EGFR)',
    'p(HGNC:AKT1) causesNoChange p(HGNC:EGFR)',
    'p(HGNC:AKT1) negativeCorrelation p(HGNC:EGFR)',
    'p(HGNC:AKT1) positiveCorrelation p(HGNC:EGFR)',
    'p(HGNC:AKT1) noCorrelation p(HGNC:EGFR)',
    'p(HGNC:AKT1) correlation p(HGNC:EGFR)',
    'p(HGNC:AKT1) regulates p(HGNC:EGFR)',
    'p(HGNC:AKT1) binds p(HGNC:EGFR)',
    'p(HGNC:AKT1) orthologous p(TESTNS2:"AKT1 ortholog")',
    'g(HGNC:AKT1) transcribedTo r(HGNC:AKT1)',
    'r(HGNC:AKT1) translatedTo p(HGNC:AKT1)',
    'p(HGNC:AKT1) isA p(TESTNS2:"AKT1 ortholog")',
    'p(HGNC:AKT1) equivalentTo p(TESTNS2:"AKT1 ortholog")',
    'p(HGNC:AKT1) partOf complex(GO:"interleukin-23 complex")',
    # variants: long and short forms
    'p(HGNC:AKT1, proteinModification(Ph, Ser, 473)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, pmod(P, S, 9)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, variant("p.Ala127Tyr")) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, var(p.Ala127Tyr)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, frag(5_20)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, fragment("?")) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, frag(?, "55kD")) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, sub(A, 127, Y)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, trunc(40)) decreases p(HGNC:EGFR)',
    'p(HGNC:AKT1, trunc(Cys, 40)) decreases p(HGNC:EGFR)',
    'g(HGNC:AKT1, sub(G, 308, A)) decreases p(HGNC:EGFR)',
    'g(HGNC:AKT1, geneModification(Me)) decreases p(HGNC:EGFR)',
    'g(HGNC:AKT1, gmod(M)) decreases p(HGNC:EGFR)',
    # multiple variants, sorted canonically
    'p(HGNC:AKT1, pmod(Ph, Thr, 308), pmod(Ph, Ser, 473)) -> p(HGNC:EGFR)',
    # fusions: current + legacy
    'p(fus(HGNC:TMPRSS2, "p.1_79", HGNC:ERG, "p.312_5034")) -> p(HGNC:EGFR)',
    'p(fus(HGNC:TMPRSS2, ?, HGNC:ERG, ?)) -> p(HGNC:EGFR)',
    'p(HGNC:TMPRSS2, fus(HGNC:ERG)) -> p(HGNC:EGFR)',
    'p(HGNC:TMPRSS2, fus(HGNC:ERG, 1, 79)) -> p(HGNC:EGFR)',
    'r(fus(HGNC:TMPRSS2, "r.1_79", HGNC:ERG, "r.312_5034")) -> p(HGNC:EGFR)',
    'g(fus(HGNC:TMPRSS2, "c.1_79", HGNC:ERG, "c.312_5034")) -> p(HGNC:EGFR)',
    # activities: BEL2 + BEL1 legacy
    'act(p(HGNC:AKT1), ma(kin)) -> p(HGNC:EGFR)',
    'act(p(HGNC:AKT1), ma(kinaseActivity)) -> p(HGNC:EGFR)',
    'act(p(HGNC:AKT1), ma(GO:"kinase activity")) -> p(HGNC:EGFR)',
    'activity(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
    'kin(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
    'cat(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
    'phos(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
    'tscript(p(HGNC:AKT1)) -> p(HGNC:EGFR)',
    # transformations
    'tloc(p(HGNC:EGFR), fromLoc(GO:"cell surface"), toLoc(GO:endosome)) -> p(HGNC:AKT1)',
    'translocation(p(HGNC:EGFR), fromLoc(GO:"cell surface"), toLoc(GO:endosome)) -> p(HGNC:AKT1)',
    'tloc(p(HGNC:EGFR), GO:"cell surface", GO:endosome) -> p(HGNC:AKT1)',
    'sec(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'cellSecretion(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'surf(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'cellSurfaceExpression(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'deg(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'degradation(p(HGNC:EGFR)) -> p(HGNC:AKT1)',
    'p(HGNC:AKT1) -> deg(p(HGNC:EGFR))',
    'p(HGNC:AKT1) -> act(p(HGNC:EGFR))',
    'p(HGNC:AKT1) -> sec(p(HGNC:EGFR))',
    # reactions
    'rxn(reactants(a(CHEBI:superoxide)), products(a(CHEBI:"hydrogen peroxide"), '
    'a(CHEBI:dioxygen))) -> p(HGNC:AKT1)',
    'reaction(reactants(a(CHEBI:superoxide)), products(a(CHEBI:dioxygen))) '
    '-> p(HGNC:AKT1)',
    # locations
    'a(CHEBI:"oxygen atom", loc(GO:intracellular)) -> p(HGNC:EGFR)',
    'p(HGNC:AKT1, location(GO:intracellular)) -> p(HGNC:EGFR)',
    # nested
    'p(HGNC:AKT1) -> (p(HGNC:EGFR) -| p(HGNC:FADD))',
    # list relations
    'p(TESTNS2:"AKT1 ortholog") hasMembers list(p(HGNC:AKT1), p(HGNC:EGFR))',
    'complex(GO:"interleukin-23 complex") hasComponents list(p(HGNC:AKT1))',
    'p(TESTNS2:"AKT1 ortholog") hasMember p(HGNC:AKT1)',
    'complex(GO:"interleukin-23 complex") hasComponent p(HGNC:AKT1)',
    # singleton term lines
    'complex(p(HGNC:AKT1), p(HGNC:EGFR))',
    'p(HGNC:CFTR, var("="))',
    'p(HGNC:CFTR, var(?))',
    # statement groups / rate-limiting / biomarkers / subprocess
    'bp(GO:"apoptotic process") rateLimitingStepOf bp(GO:"cell cycle arrest")',
    'kin(p(HGNC:AKT1)) rateLimitingStepOf bp(GO:"apoptotic process")',
    'bp(GO:"apoptotic process") subProcessOf bp(GO:"cell cycle arrest")',
    'rxn(reactants(a(CHEBI:superoxide)), products(a(CHEBI:dioxygen))) '
    'subProcessOf bp(GO:"apoptotic process")',
    'p(HGNC:AKT1) biomarkerFor path(MESHD:Psoriasis)',
    'p(HGNC:AKT1) prognosticBiomarkerFor path(MESHD:Psoriasis)',
    # quoting edge cases
    'a(CHEBI:"oxygen atom") -- a(CHEBI:water)',
    'a(TESTNS2:"Abeta_42") -> p(HGNC:AKT1)',
]

CONTEXT = [
    'SET Citation = {"PubMed","Case","999999"}',
    'SET Evidence = "grammar case"',
]


def main():
    cases = []
    for statement in CASES:
        lines = CORPUS_HEADER + CONTEXT + [statement]
        graph = compile_bel_lines(lines)
        golden = graph_to_golden(graph)
        cases.append({
            'statement': statement,
            'nodes': sorted(r['bel'] for r in golden['nodes']),
            'node_md5s': {r['bel']: r['md5'] for r in golden['nodes']},
            'edges': sorted(
                (e['source'], e['relation'], e['target'])
                for e in golden['edges']),
            'triples': sorted(tuple(t) for t in golden['triples']),
            'warnings': sorted(w['error_class'] for w in golden['warnings']),
        })
    out = os.path.join(HERE, 'grammar_cases.json')
    with open(out, 'w') as f:
        json.dump(cases, f, indent=1, sort_keys=True)
    n_warn = sum(1 for c in cases if c['warnings'])
    print('wrote', out, '-', len(cases), 'cases,', n_warn, 'with warnings')


if __name__ == '__main__':
    main()
