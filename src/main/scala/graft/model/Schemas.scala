package graft.model

import java.sql.Date

/** Typed row models for the OpenMRS core entities the reference populates
  * (reference `README.md:7-19`; column sets are the public OpenMRS core
  * schema — SURVEY.md §1.2). Case classes give compile-time field checks
  * via `Dataset[T]` encoders where the schema is fixed; the dynamic-schema
  * paths (pivot, unpivot) stay `DataFrame`.
  */
object Schemas {

  /** Legacy DREAMS client row (reference `README.md:2`) as exercised through
    * the `customer` stand-in (FIXTURES.md §2).
    */
  final case class LegacyClient(
      client_id: Long,
      full_name: String,
      nation_key: Int,
      acct_bal: Double,
      segment: String)

  /** `person` core row (reference `README.md:9,19`). */
  final case class Person(
      person_id: Long,
      gender: Option[String],
      birthdate: Option[Date],
      birthdate_estimated: Boolean,
      creator: Long,
      voided: Boolean,
      uuid: String)

  /** `person_name` row (reference `README.md:9`). */
  final case class PersonName(
      person_name_id: Long,
      person_id: Long,
      given_name: Option[String],
      middle_name: Option[String],
      family_name: Option[String],
      preferred: Boolean,
      uuid: String)

  /** `person_address` row (reference `README.md:11`). */
  final case class PersonAddress(
      person_address_id: Long,
      person_id: Long,
      city_village: Option[String],
      state_province: Option[String],
      country: Option[String],
      uuid: String)

  /** `person_attribute` EAV row (reference `README.md:11`). */
  final case class PersonAttribute(
      person_attribute_id: Long,
      person_id: Long,
      attr_type: String,
      value: String,
      uuid: String)

  /** `patient_identifier` row with the priority rule input (reference
    * `README.md:13-15`): National ID, else Birth Certificate, else a
    * generated identifier with a Luhn mod-30 check digit.
    */
  final case class PatientIdentifier(
      patient_identifier_id: Long,
      patient_id: Long,
      identifier: String,
      identifier_type: String,
      preferred: Boolean,
      uuid: String)

  /** `dreams_client_patient_mapping` row (reference `README.md:17`). */
  final case class ClientPatientMapping(client_id: Long, patient_id: Long)
}
