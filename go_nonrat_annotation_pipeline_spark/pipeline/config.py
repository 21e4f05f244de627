"""Pipeline configuration (mirrors the reference's Spring XML wiring,
src/main/dist/properties/AppConfigure.xml:3-61; FIXTURES.md §4)."""

from __future__ import annotations

from dataclasses import dataclass, field

# Species type keys (rgdcore SpeciesType constants; SURVEY.md §1.1)
HUMAN, MOUSE, RAT, CHINCHILLA = 1, 2, 3, 4

# xdb keys per source DB (reference MAHQC.qcGenes, MAHQC.java:101-135;
# rgdcore XdbId constants)
XDB_KEY_UNIPROT = 14
XDB_KEY_UNIPROT_SECONDARY = 60
XDB_KEY_HGNC = 21
XDB_KEY_ENSEMBL = 20
XDB_KEY_MGD = 5
XDB_KEY_RNACENTRAL = 68

PRIMARY_XDB_KEY = {
    "UniProtKB": XDB_KEY_UNIPROT,
    "HGNC": XDB_KEY_HGNC,
    "Ensembl": XDB_KEY_ENSEMBL,
    "MGI": XDB_KEY_MGD,
    "RNAcentral": XDB_KEY_RNACENTRAL,
}

CATALYTIC_ACTIVITY_TERM = "GO:0003824"  # DAO.isCatalyticActivityTerm


@dataclass
class PipelineConfig:
    """Run parameters (AppConfigure.xml:13-60)."""

    mgi_ref_rgd_id: int = 2290270
    iso_ref_rgd_id: int = 1624291
    goa_all_species_ref_rgd_id: int = 150520179
    created_by: int = 190
    stale_annot_delete_threshold: str = "10%"
    source_subst: dict[str, str] = field(
        default_factory=lambda: {"UniProtKB": "UniProt"}
    )
    evidence_codes_for_iso: frozenset[str] = frozenset(
        {"EXP", "IDA", "IEP", "IGI", "IMP", "IPI"}
    )
    mouse_sources: tuple[str, ...] = ("MGI", "UniProtKB")
    all_species_sources: tuple[str, ...] = ("UniProtKB", "RNAcentral")
    stale_cutoff_minutes: int = 10  # cutoff = run start − 10 min (:98)
