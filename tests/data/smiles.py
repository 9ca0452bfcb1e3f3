"""Test molecules: 100 drug-like SMILES (rings, aromatics, charges, stereo).

Plays the role of the reference's ChEMBL-derived fixtures
(``tests/test_data/chembl_1k.smi``, ``nvmolkit/tests/testdata/smiles.csv``).
"""

SMILES_100 = [
    "CC(=O)Oc1ccccc1C(=O)O",                      # aspirin
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",                 # caffeine
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",                 # ibuprofen
    "CC(=O)Nc1ccc(O)cc1",                         # paracetamol
    "c1ccccc1",                                   # benzene
    "C1CCCCC1",                                   # cyclohexane
    "c1ccc2ccccc2c1",                             # naphthalene
    "c1ccc2c(c1)ccc3c2cccc3",                     # anthracene (angular)
    "C1CC1",                                      # cyclopropane
    "C1CCC1",                                     # cyclobutane
    "CCO",                                        # ethanol
    "CC(=O)O",                                    # acetic acid
    "CCN(CC)CC",                                  # triethylamine
    "CC(C)O",                                     # isopropanol
    "C=CC=C",                                     # butadiene
    "C#N",                                        # HCN
    "CC#CC",                                      # 2-butyne
    "c1ccncc1",                                   # pyridine
    "c1cc[nH]c1",                                 # pyrrole
    "c1ccoc1",                                    # furan
    "c1ccsc1",                                    # thiophene
    "c1cnc[nH]1",                                 # imidazole
    "c1cnon1",                                    # oxadiazole-like (1,2,5?) keep simple
    "c1ccc(cc1)O",                                # phenol
    "c1ccc(cc1)N",                                # aniline
    "c1ccc(cc1)C(=O)O",                           # benzoic acid
    "c1ccc(cc1)S(=O)(=O)N",                       # benzenesulfonamide
    "Clc1ccccc1",                                 # chlorobenzene
    "Brc1ccccc1Br",                               # dibromobenzene
    "Ic1ccc(F)cc1",                               # iodo-fluorobenzene
    "O=C(O)c1ccccc1O",                            # salicylic acid
    "CC(C)(C)c1ccc(O)cc1",                        # 4-tert-butylphenol
    "CCOC(=O)c1ccccc1",                           # ethyl benzoate
    "COc1ccc(CCN)cc1",                            # methoxyphenethylamine
    "CN1CCC[C@H]1c1cccnc1",                       # nicotine
    "C[C@@H](N)C(=O)O",                           # alanine
    "N[C@@H](Cc1ccccc1)C(=O)O",                   # phenylalanine
    "N[C@@H](CO)C(=O)O",                          # serine
    "N[C@@H](CS)C(=O)O",                          # cysteine
    "N[C@@H](CCSC)C(=O)O",                        # methionine
    "OC[C@H]1O[C@@H](O)[C@H](O)[C@@H](O)[C@@H]1O",  # glucose
    "C[N+](C)(C)CCO",                             # choline
    "[O-]C(=O)c1ccccc1",                          # benzoate anion
    "[NH4+]",                                     # ammonium
    "[Na+].[Cl-]",                                # salt pair
    "CC(=O)[O-]",                                 # acetate
    "CCCCCCCCCCCCCCCC(=O)O",                      # palmitic acid
    "C(CCCCCCCC=CCCCCCCCC)(=O)O",                 # oleic-like
    "OCC(O)CO",                                   # glycerol
    "C1CCOC1",                                    # THF
    "C1COCCO1",                                   # dioxane
    "C1CCNCC1",                                   # piperidine
    "C1CNCCN1",                                   # piperazine
    "C1CCNC1",                                    # pyrrolidine
    "O=C1CCCCC1",                                 # cyclohexanone
    "OC1CCCCC1",                                  # cyclohexanol
    "O=C1NC(=O)NC(=O)C1",                         # barbituric acid
    "c1ccc(cc1)c1ccccc1",                         # biphenyl
    "c1ccc(cc1)Cc1ccccc1",                        # diphenylmethane
    "c1ccc(cc1)Oc1ccccc1",                        # diphenyl ether
    "O=C(Nc1ccccc1)c1ccccc1",                     # benzanilide
    "CC(C)NCC(O)COc1ccccc1",                      # propranolol-like fragment
    "CN(C)CCOC(c1ccccc1)c1ccccc1",                # diphenhydramine
    "CC(N)Cc1ccccc1",                             # amphetamine
    "CNC(C)Cc1ccccc1",                            # methamphetamine
    "COc1cc2c(cc1OC)CCN2",                        # indoline-like dimethoxy
    "Cc1ccccc1C",                                 # o-xylene
    "Cc1cccc(C)c1C",                              # trimethylbenzene
    "CC(C)c1ccccc1",                              # cumene
    "C=Cc1ccccc1",                                # styrene
    "OCc1ccccc1",                                 # benzyl alcohol
    "O=Cc1ccccc1",                                # benzaldehyde
    "CC(=O)c1ccccc1",                             # acetophenone
    "N#Cc1ccccc1",                                # benzonitrile
    "O=[N+]([O-])c1ccccc1",                       # nitrobenzene
    "Nc1ccc(cc1)S(=O)(=O)Nc1ncccn1",              # sulfadiazine
    "CC1=CC(=O)CC(C)(C)C1",                       # isophorone
    "O=C1OC(=O)c2ccccc12",                        # phthalic anhydride
    "c1ccc2[nH]ccc2c1",                           # indole
    "c1ccc2ncccc2c1",                             # quinoline
    "c1ccc2ccncc2c1",                             # isoquinoline
    "c1cnc2[nH]ccc2c1",                           # azaindole
    "c1ccc2c(c1)oc1ccccc12",                      # dibenzofuran
    "c1ccc2c(c1)sc1ccccc12",                      # dibenzothiophene
    "C1=CC2CCC1CC2",                              # norbornene-like bicycle
    "C1CC2CCC1CC2",                               # bicyclo[2.2.2]octane
    "OC(=O)C1CCCCC1",                             # cyclohexanecarboxylic acid
    "NC(=O)C1CCCCC1",                             # amide
    "CON=C(C(=O)O)c1ccccc1",                      # oxime ether acid
    "CSc1ccccc1",                                 # thioanisole
    "FC(F)(F)c1ccccc1",                           # benzotrifluoride
    "CC(C)(C)OC(=O)N1CCCC1",                      # Boc-pyrrolidine
    "O=S(=O)(O)c1ccccc1",                         # benzenesulfonic acid
    "P(=O)(O)(O)Oc1ccccc1",                       # phenyl phosphate (P in brackets not needed)
    "CCOP(=O)(OCC)OCC",                           # triethyl phosphate
    "CN1CCN(CC1)c1ccccc1",                        # phenylpiperazine
    "O=C(O)CC(O)(CC(=O)O)C(=O)O",                 # citric acid
    "OC(=O)C=CC(=O)O",                            # fumaric/maleic acid
    "CC12CCC(CC1)C(C)(C)O2",                      # eucalyptol-like
    "CC(C)CC(N)C(=O)O",                           # leucine
]
assert len(SMILES_100) == 100
