package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's FULL assay + species lookup tables and key-selection
  * semantics (reformat_metadata_file.py:4-181, 348-393, 418-439) as
  * broadcast-join data.
  *
  * The lookup is DATA, not logic: 85 library-preparation rows mapping to
  * (library_strategy, experiment_type, library_source, biomaterial_type)
  * and a 4-row species table. The reference resolves duplicate keys with
  * "first row in table order" (reformat_metadata_file.py:380-382's
  * iloc[0]); the same tie rule here is applied ONCE at build time
  * (driver-side dedup of static data), so the per-row path is a plain
  * broadcast lookup join with no window.
  */
object AssayLookup {

  /** One row of EXPERIMENT_TYPE_LOOKUP (reformat_metadata_file.py:4-181). */
  final case class R(
      libraryPreparation: String, libraryType: String,
      libraryStrategy: String, experimentType: String,
      librarySource: String, biomaterialType: String)

  /** All 85 rows, verbatim, in reference table order (order IS the
    * first-match tie rule). */
  val experimentTypeLookup: Seq[R] = Seq(
    R("WHOLE GENOME SEQUENCING - SAMPLE", "WHOLE GENOME",
      "WGS", "WGS", "GENOMIC", "UNKNOWN"),
    R("WHOLE GENOME SEQUENCING HUMAN - SAMPLE", "WHOLE GENOME",
      "WGS", "WGS", "GENOMIC", "UNKNOWN"),
    R("WHOLE GENOME SEQUENCING - BACTERIA", "WHOLE GENOME",
      "WGS", "WGS", "GENOMIC", "UNKNOWN"),
    R("WGA", "WGA",
      "WGA", "WGA", "GENOMIC", "UNKNOWN"),
    R("WHOLE EXOME CAPTURE - EXONS - SAMPLE", "HYBRID CAPTURE - EXOME",
      "WXS", "WXS", "GENOMIC", "UNKNOWN"),
    R("WHOLE EXOME CAPTURE - EXONS + UTR - SAMPLE", "HYBRID CAPTURE - EXOME",
      "WXS", "WXS-UTR", "GENOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - RIBOSOME PROFILING - SAMPLE", "TOTAL RNA",
      "RNA-SEQ", "RIBOSOME-PROFILING", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - TOTAL RNA", "TOTAL RNA",
      "RNA-SEQ", "TOTAL-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - MRNA", "MRNA",
      "RNA-SEQ", "POLYA-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - MRNA STRANDED - SAMPLE", "RNA",
      "RNA-SEQ", "POLYA-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - TOTAL RNA WITH RRNA DEPLETION - SAMPLE", "RNA",
      "RNA-SEQ", "TOTAL-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - LOW INPUT WITH RIBODEPLETION", "MRNA",
      "RNA-SEQ", "RIBODEPLETION", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - TOTAL RNA WITH GLOBIN DEPLETION", "TOTAL RNA",
      "RNA-SEQ", "TOTAL-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - MRNA RNA WITH GLOBIN DEPLETION", "MRNA",
      "RNA-SEQ", "POLYA-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - 3' END RNA-SEQ", "MRNA",
      "RNA-SEQ", "POLYA-RNA-3P", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("SINGLE CELL -3' RNASEQ- SAMPLE", "SINGLE CELL-3' RNA",
      "RNA-SEQ", "TENX-TRANSCRIPTOME-3P", "TRANSCRIPTOMIC_SINGLE_CELL", "UNKNOWN"),
    R("SINGLE CELL -3' RNASEQ- SAMPLE NUCLEI", "SINGLE CELL-3' RNA (NUCLEI)",
      "RNA-SEQ", "TENX-TRANSCRIPTOME-3P", "TRANSCRIPTOMIC_SINGLE_CELL", "SINGLE_NUCLEI"),
    R("SINGLE CELL -5' RNASEQ- SAMPLE", "SINGLE CELL-5' RNA",
      "RNA-SEQ", "TENX-TRANSCRIPTOME-5P", "TRANSCRIPTOMIC_SINGLE_CELL", "UNKNOWN"),
    R("SINGLE CELL -5' RNASEQ- SAMPLE NUCLEI", "SINGLE CELL-5' RNA (NUCLEI)",
      "RNA-SEQ", "TENX-TRANSCRIPTOME-5P", "TRANSCRIPTOMIC_SINGLE_CELL", "SINGLE_NUCLEI"),
    R("METAGENOMIC PROFILING - 16S RRNA SEQUENCING - SAMPLE", "16S",
      "RNA-SEQ", "16S", "METAGENOMIC", "UNKNOWN"),
    R("RNA SEQUENCING - SMALL RNA - SAMPLE", "SMALL RNA",
      "MIRNA-SEQ", "SMALL-RNA", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("NCRNA-SEQ", "NCRNA-SEQ",
      "NCRNA-SEQ", "NCRNA-SEQ", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("FL-CDNA", "FL-CDNA",
      "FL-CDNA", "FL-CDNA", "GENOMIC", "UNKNOWN"),
    R("EST", "EST",
      "EST", "EST", "TRANSCRIPTOMIC", "UNKNOWN"),
    R("HI-C SEQ", "HI-C SEQ",
      "HI-C", "HI-C", "GENOMIC", "UNKNOWN"),
    R("ATAC SEQ", "ATAC SEQ",
      "ATAC-SEQ", "ATAC-SEQ", "GENOMIC", "UNKNOWN"),
    R("DNASE-SEQ", "DNASE-SEQ",
      "DNASE-SEQ", "DNASE-SEQ", "GENOMIC", "UNKNOWN"),
    R("WCS", "WCS",
      "WCS", "WCS", "GENOMIC", "UNKNOWN"),
    R("RAD-SEQ", "RAD-SEQ",
      "RAD-SEQ", "RAD-SEQ", "GENOMIC", "UNKNOWN"),
    R("CLONE", "CLONE",
      "CLONE", "CLONE", "GENOMIC", "UNKNOWN"),
    R("POOLCLONE", "POOLCLONE",
      "POOLCLONE", "POOLCLONE", "GENOMIC", "UNKNOWN"),
    R("AMPLICON SEQUENCING - ILLUMINA TRUSEQ CUSTOM AMPLICON", "AMPLICON SEQ",
      "AMPLICON", "AMPLICON", "GENOMIC", "UNKNOWN"),
    R("CLONEEND", "CLONEEND",
      "CLONEEND", "CLONEEND", "GENOMIC", "UNKNOWN"),
    R("FINISHING", "FINISHING",
      "FINISHING", "FINISHING", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - SAMPLE", "CHIP SEQ",
      "CHIP-SEQ", "TF", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - INPUT", "CHIP SEQ - INPUT",
      "CHIP-SEQ", "CHIP-INPUT", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - TF", "CHIP SEQ - TF",
      "CHIP-SEQ", "TF", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - BROAD PEAK", "CHIP SEQ - BROAD PEAK",
      "CHIP-SEQ", "HISTONE-BROAD", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - NARROW PEAK", "CHIP SEQ - NARROW PEAK",
      "CHIP-SEQ", "HISTONE-NARROW", "GENOMIC", "UNKNOWN"),
    R("MNASE-SEQ", "MNASE-SEQ",
      "MNASE-SEQ", "MNASE-SEQ", "GENOMIC", "UNKNOWN"),
    R("DNASE-HYPERSENSITIVITY", "DNASE-HYPERSENSITIVITY",
      "DNASE-HYPERSENSITIVITY", "DNASE-HYPERSENSITIVITY", "GENOMIC", "UNKNOWN"),
    R("METHYLATION PROFILING - RRBS-SEQ - SAMPLE", "RRBS-SEQ",
      "BISULFITE-SEQ", "RRBS-SEQ", "GENOMIC", "UNKNOWN"),
    R("METHYLATION PROFILING - WHOLE GENOME BISULFITE SEQUENCING - SAMPLE", "BISULFITE SEQ",
      "BISULFITE-SEQ", "WGBS", "GENOMIC", "UNKNOWN"),
    R("CTS", "CTS",
      "CTS", "CTS", "GENOMIC", "UNKNOWN"),
    R("MRE-SEQ", "MRE-SEQ",
      "MRE-SEQ", "MRE-SEQ", "GENOMIC", "UNKNOWN"),
    R("METHYLATION PROFILING - MEDIP-SEQ - SAMPLE", "MEDIP-SEQ",
      "MEDIP-SEQ", "MEDIP-SEQ", "GENOMIC", "UNKNOWN"),
    R("METHYLATION PROFILING - MBD-SEQ - SAMPLE", "MBD-SEQ",
      "MBD-SEQ", "MBD-SEQ", "GENOMIC", "UNKNOWN"),
    R("TN-SEQ", "TN-SEQ",
      "TN-SEQ", "TN-SEQ", "GENOMIC", "UNKNOWN"),
    R("VALIDATION", "VALIDATION",
      "VALIDATION", "VALIDATION", "GENOMIC", "UNKNOWN"),
    R("FAIRE-SEQ", "FAIRE-SEQ",
      "FAIRE-SEQ", "FAIRE-SEQ", "GENOMIC", "UNKNOWN"),
    R("SELEX", "SELEX",
      "SELEX", "SELEX", "GENOMIC", "UNKNOWN"),
    R("RIP-SEQ", "RIP-SEQ",
      "RIP-SEQ", "RIP-SEQ", "GENOMIC", "UNKNOWN"),
    R("CHIA-PET", "CHIA-PET",
      "CHIA-PET", "CHIA-PET", "GENOMIC", "UNKNOWN"),
    R("SYNTHETIC-LONG-READ", "SYNTHETIC-LONG-READ",
      "SYNTHETIC-LONG-READ", "SYNTHETIC-LONG-READ", "GENOMIC", "UNKNOWN"),
    R("TARGETED CAPTURE AGILENT (PROBES PROVIDED BY COLL.) - SAMPLE", "HYBRID CAPTURE - PANEL",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE: 1 TO 499KB - SAMPLE", "HYBRID CAPTURE - CUSTOM",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE: 0.5 TO 2.9MB - SAMPLE", "HYBRID CAPTURE - CUSTOM",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE: 3 TO 5.9MB - SAMPLE", "HYBRID CAPTURE - CUSTOM",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE: 6 TO 11.9MB - SAMPLE", "HYBRID CAPTURE - CUSTOM",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE: 12 TO 24MB - SAMPLE", "HYBRID CAPTURE - CUSTOM",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("CUSTOM TARGET CAPTURE - TRUSIGHT CARDIO - SAMPLE", "HYBRID CAPTURE - PANEL",
      "TARGETED-CAPTURE", "TARGETED-CAPTURE", "GENOMIC", "UNKNOWN"),
    R("TETHERED", "TETHERED",
      "TETHERED", "TETHERED", "GENOMIC", "UNKNOWN"),
    R("NOME-SEQ", "NOME-SEQ",
      "NOME-SEQ", "NOME-SEQ", "GENOMIC", "UNKNOWN"),
    R("OTHER-SPECIFY IN COMMENT BOX", "OTHER",
      "UNKNOWN", "UNKNOWN", "UNKNOWN", "UNKNOWN"),
    R("CHIRP SEQ", "CHIRP SEQ",
      "CHIRP SEQ", "CHIRP SEQ", "GENOMIC", "UNKNOWN"),
    R("4-C SEQ", "4-C SEQ",
      "4-C-SEQ", "4-C-SEQ", "GENOMIC", "UNKNOWN"),
    R("5-C SEQ", "5-C SEQ",
      "5-C-SEQ", "5-C-SEQ", "GENOMIC", "UNKNOWN"),
    R("METAGENOMICS - OTHER", "METAGENOMICS - OTHER",
      "WGS", "METAGENOMIC", "METAGENOMIC", "UNKNOWN"),
    R("DROP-SEQ-TRANSCRIPTOME", "DROP-SEQ-TRANSCRIPTOME",
      "RNA-SEQ", "DROP-SEQ-TRANSCRIPTOME", "TRANSCRIPTOMIC SINGLE CELL", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K27ME3", "CHIP SEQ - H3K27ME3",
      "CHIP-SEQ", "H3K27ME3", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K27AC", "CHIP SEQ - H3K27AC",
      "CHIP-SEQ", "H3K27AC", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K9ME3", "CHIP SEQ - H3K9ME3",
      "CHIP-SEQ", "H3K9ME3", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K36ME3", "CHIP SEQ - H3K36ME3",
      "CHIP-SEQ", "H3K36ME3", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3F3A", "CHIP SEQ - H3F3A",
      "CHIP-SEQ", "H3F3A", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K4ME1", "CHIP SEQ - H3K4ME1",
      "CHIP-SEQ", "H3K4ME1", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K79ME2", "CHIP SEQ - H3K79ME2",
      "CHIP-SEQ", "H3K79ME2", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K79ME3", "CHIP SEQ - H3K79ME3",
      "CHIP-SEQ", "H3K79ME3", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K9ME1", "CHIP SEQ - H3K9ME1",
      "CHIP-SEQ", "H3K9ME1", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K9ME2", "CHIP SEQ - H3K9ME2",
      "CHIP-SEQ", "H3K9ME2", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H4K20ME1", "CHIP SEQ - H4K20ME1",
      "CHIP-SEQ", "H4K20ME1", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H2AFZ", "CHIP SEQ - H2AFZ",
      "CHIP-SEQ", "H2AFZ", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3AC", "CHIP SEQ - H3AC",
      "CHIP-SEQ", "H3AC", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K4ME2", "CHIP SEQ - H3K4ME2",
      "CHIP-SEQ", "H3K4ME2", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K4ME3", "CHIP SEQ - H3K4ME3",
      "CHIP-SEQ", "H3K4ME3", "GENOMIC", "UNKNOWN"),
    R("CHIP SEQUENCING - H3K9AC", "CHIP SEQ - H3K9AC",
      "CHIP-SEQ", "H3K9AC", "GENOMIC", "UNKNOWN"))

  /** SPECIES_LOOKUP (reformat_metadata_file.py:176-181). */
  final case class SpeciesR(speciesText: String, speciesName: String,
      taxonId: String, scientificName: String)

  val speciesLookup: Seq[SpeciesR] = Seq(
    SpeciesR("HUMAN", "HG38", "9606", "Homo sapiens"),
    SpeciesR("HUMAN_HG37", "HG37", "9606", "Homo sapiens"),
    SpeciesR("MOUSE", "MM10", "10090", "Mus musculus"),
    SpeciesR("MOUSE_MM9", "MM9", "10090", "Mus musculus"))

  private def firstByKey(key: R => String): Seq[(String, R)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, R]
    experimentTypeLookup.foreach { r =>
      val k = key(r).trim.toUpperCase
      if (!seen.contains(k)) seen(k) = r
    }
    seen.toSeq
  }

  /** Resolve assay columns for rows carrying (library_preparation,
    * sample_description, library_type) — the reference's get_assay_info
    * (reformat_metadata_file.py:348-393) as TWO broadcast joins + a CASE:
    *
    *  - prep == 'NOT APPLICABLE' && desc == 'PRE MADE LIBRARY' → match on
    *    library_type;
    *  - else prep non-empty and != 'NOT APPLICABLE' → match on
    *    library_preparation;
    *  - else, or no lookup hit → all four outputs 'UNKNOWN'.
    *
    * Inputs are upper(trim(...))-normalized exactly like the reference.
    * Adds library_source, library_strategy, experiment_type,
    * biomaterial_type. */
  def withAssayInfo(df: DataFrame, prepCol: Column, descCol: Column,
                    typeCol: Column): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val byPrep = firstByKey(_.libraryPreparation).map { case (k, r) =>
      (k, r.librarySource, r.libraryStrategy, r.experimentType, r.biomaterialType)
    }.toDF("__prep_key", "p_src", "p_strat", "p_exp", "p_bio")
    val byType = firstByKey(_.libraryType).map { case (k, r) =>
      (k, r.librarySource, r.libraryStrategy, r.experimentType, r.biomaterialType)
    }.toDF("__type_key", "t_src", "t_strat", "t_exp", "t_bio")

    val prep = upper(trim(coalesce(prepCol, lit(""))))
    val desc = upper(trim(coalesce(descCol, lit(""))))
    val ltyp = upper(trim(coalesce(typeCol, lit(""))))
    val usePremade = prep === "NOT APPLICABLE" && desc === "PRE MADE LIBRARY"
    val usePrep = prep =!= "NOT APPLICABLE" && prep =!= ""

    def out(name: String, p: Column, t: Column): Column =
      when(usePremade, coalesce(t, lit("UNKNOWN")))
        .when(usePrep, coalesce(p, lit("UNKNOWN")))
        .otherwise("UNKNOWN").as(name)

    df.withColumn("__prep_key", when(usePrep && !usePremade, prep))
      .withColumn("__type_key", when(usePremade, ltyp))
      .join(broadcast(byPrep), Seq("__prep_key"), "left_outer")
      .join(broadcast(byType), Seq("__type_key"), "left_outer")
      .withColumn("library_source", out("library_source", col("p_src"), col("t_src")))
      .withColumn("library_strategy", out("library_strategy", col("p_strat"), col("t_strat")))
      .withColumn("experiment_type", out("experiment_type", col("p_exp"), col("t_exp")))
      .withColumn("biomaterial_type", out("biomaterial_type", col("p_bio"), col("t_bio")))
      .drop("__prep_key", "__type_key", "p_src", "p_strat", "p_exp", "p_bio",
        "t_src", "t_strat", "t_exp", "t_bio")
  }

  /** Species info via SPECIES_LOOKUP: adds species_name, taxon_id,
    * scientific_name (reformat_metadata_file.py:418-439). */
  def withSpeciesInfo(df: DataFrame, speciesTextCol: Column): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val lk = speciesLookup.map(r =>
      (r.speciesText, r.speciesName, r.taxonId, r.scientificName))
      .toDF("__species_key", "s_name", "s_taxon", "s_sci")
    df.withColumn("__species_key", upper(trim(coalesce(speciesTextCol, lit("")))))
      .join(broadcast(lk), Seq("__species_key"), "left_outer")
      .withColumn("species_name", coalesce(col("s_name"), lit("UNKNOWN")))
      .withColumn("taxon_id", col("s_taxon"))
      .withColumn("scientific_name", col("s_sci"))
      .drop("__species_key", "s_name", "s_taxon", "s_sci")
  }
}
